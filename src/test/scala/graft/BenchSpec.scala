package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's fail-loud contract (VERDICT r05 #6): a query
  * that throws during any rep is reported as FAILED (empty timings → -1
  * in the JSON + listed under "failed"), never as a time-to-failure
  * masquerading as a fast number. Pure-JVM — no SparkSession needed. */
class BenchSpec extends AnyFunSuite {

  test("a healthy body yields exactly 3 sorted timings") {
    val rs = Bench.timeReps("ok", () => ())
    assert(rs.size == 3)
    assert(rs == rs.sorted)
    assert(rs.forall(_ >= 0.0))
  }

  test("a body that always throws yields empty (= failed), not a timing") {
    var calls = 0
    val rs = Bench.timeReps("boom", () => { calls += 1; sys.error("broken query") })
    assert(rs.isEmpty)
    // stops at the first failed rep — no wasted reruns of a broken query
    assert(calls == 1)
  }

  test("a body that fails on rep 2 is failed — cold-run-only success is broken") {
    var calls = 0
    val rs = Bench.timeReps("flaky", () => { calls += 1; if (calls == 2) sys.error("late failure") })
    assert(rs.isEmpty)
    assert(calls == 2)
  }

  test("r01 like-for-like subset is exactly the 58 names recorded in BENCH_r01.json") {
    assert(Bench.r01Subset.size == 58)
    // every subset name must still exist in the catalog, or the subset
    // total silently shrinks and the acceptance band reads better than real
    val known = SparkEntry.catalog.map(_.name).toSet
    val gone = Bench.r01Subset.diff(known)
    assert(gone.isEmpty, s"r01 subset names missing from catalog: $gone")
  }
}

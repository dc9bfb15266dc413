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

  test("artifact parsers extract the bench's own flat JSON shapes") {
    val text = """{"metric":"total_detail","value":12.5,""" +
      """"queries":{"q01_x":1.250,"d03_y":-1.000,"t01_z":0.034},""" +
      """"control_drift":0.982,"sf":"/root/testdata/sf0.1","round":"r11"}"""
    assert(Bench.parseJsonMap(text, "queries") ==
      Map("q01_x" -> 1.25, "d03_y" -> -1.0, "t01_z" -> 0.034))
    assert(Bench.parseJsonMap(text, "not_there").isEmpty)
    assert(Bench.parseJsonNum(text, "control_drift").contains(0.982))
    assert(Bench.parseJsonNum(text, "absent").isEmpty)
    assert(Bench.parseJsonStr(text, "round").contains("r11"))
  }

  test("swing flagging: >2x over prev AND >=1s floor, slowest first") {
    val prev = Map("a" -> 2.0, "b" -> 0.3, "c" -> 5.0, "d" -> 1.0)
    val cur = Seq(
      "a" -> 4.5,  // 2.25x and >=1s -> flagged
      "b" -> 0.9,  // 3x but under the 1s floor -> noise, not flagged
      "c" -> 9.0,  // 1.8x -> inside band
      "d" -> 30.0, // 30x -> flagged, slowest so FIRST
      "e" -> 50.0, // no prev record -> cannot be adjudicated, skipped
      "f" -> -1.0) // failed query -> never flagged
    assert(Bench.flagSwings(cur, prev) == Seq("d", "a"))
    // exactly-2x is the band edge, not a swing
    assert(Bench.flagSwings(Seq("a" -> 4.0), prev).isEmpty)
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

package graft

/** Every catalog query WITHOUT a DuckDB oracle gets only a rows-only
  * driver check — which silently re-runs the query. This suite pins the
  * property that check depends on: two independent executions produce
  * identical row multisets. (The oracled queries get this for free from
  * the hash compare.) */
class DeterminismSpec extends SparkSpec {

  private val noOracle = SparkEntry.catalog.filter(_.oracle.isEmpty)

  test("all rows-only queries are run-to-run deterministic") {
    assert(noOracle.nonEmpty)
    noOracle.foreach { q =>
      val a = q.run(spark, sf).collect().map(_.toString).sorted.toSeq
      val b = q.run(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"${q.name} differs between runs")
      assert(a.nonEmpty, s"${q.name} returned no rows at $sf")
    }
  }
}

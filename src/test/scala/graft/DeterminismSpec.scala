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

  test("q36 exact moments agree with Spark's built-in statistics") {
    import org.apache.spark.sql.functions._
    val builtin = model.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        stddev_samp(col("l_quantity")).as("sd"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("sl"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("ic"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val exact = ops.Relational.q36.run(spark, sf).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (c, sd, sl, ic) = builtin(r.getString(0))
      def close(a: Double, b: Double, what: String): Unit =
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
          s"flag ${r.getString(0)} $what: exact=$a builtin=$b")
      // builtin accumulates raw doubles; exact sums quantised cents —
      // agreement is to quantisation noise, not to the ulp
      close(r.getDouble(2), c, "corr")
      close(r.getDouble(3), sd, "stddev")
      close(r.getDouble(4), sl, "slope")
      close(r.getDouble(5), ic, "intercept")
    }
  }
}

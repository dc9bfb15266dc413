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

  test("q41 snapshot+delta merge equals a full recompute exactly") {
    // the mergeability law incremental maintenance rests on: aggregating
    // partials must be indistinguishable from aggregating the raw rows —
    // exact (DECIMAL sums, integer counts, min/max), not approximate
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val merged = ops.Relational.q41.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.get(4), r.get(5)))).toMap
    val full = model.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sq"),
        count(lit(1)).cast("long").as("n"),
        min("l_shipdate").as("mn"), max("l_shipdate").as("mx"))
      .select(col("l_returnflag"), col("sq").cast("double").as("sum_qty"),
        col("n"), (col("sq").cast("double") / col("n")).as("avg_qty"),
        col("mn"), col("mx"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.get(4), r.get(5)))).toMap
    assert(merged == full, "partial-merge must equal the one-shot aggregate")
    // the construction must actually split: both sides of the cutoff
    // need rows, or the test degenerates to recompute == recompute
    val cut = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val before = model.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") < lit(cut)).count()
    val after = model.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(cut)).count()
    assert(before > 0 && after > 0, s"degenerate split: before=$before after=$after")
  }
}

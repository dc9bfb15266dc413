package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability in ONE pass — `Dataset.observe`: a 100 TB
  * clean-corpus job must account for what it kept (rows, quality mass,
  * per-gate survivors) WITHOUT a second scan of the corpus; `observe`
  * attaches accumulator-backed metrics to the existing plan and the
  * numbers arrive with the action that was running anyway. This pins the
  * API surface and that the observed metrics equal a recount. */
class ObservationSpec extends SparkSpec {

  test("observe() collects corpus accounting in the same pass as the query") {
    val obs = Observation("clean-corpus-accounting")
    val cleaned = ops.CleanCorpus.p01.run(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_kept"),
        sum(col("quality")).as("quality_mass"),
        min(col("quality")).as("min_quality"),
        // exact DISTINCT is disallowed in observed metrics (single-pass
        // accumulators can't hold a distinct set) — the HLL sketch is
        // the metric a 100 TB job would observe anyway
        approx_count_distinct(col("source")).as("n_sources"))
    val rows = cleaned.collect() // the one action; metrics ride along
    val m = obs.get
    assert(m("n_kept") == rows.length.toLong)
    val exactSources = rows.map(_.getString(1)).distinct.length.toLong
    val approx = m("n_sources").asInstanceOf[Long]
    assert(math.abs(approx - exactSources) <= math.max(1L, exactSources / 5),
      s"approx=$approx exact=$exactSources")
    // every survivor cleared the quality gate — the observed min proves
    // the gate held without re-reading the output
    assert(m("min_quality").asInstanceOf[Double] >= ops.CleanCorpus.QualityThreshold)
    val recount = rows.map(_.getDouble(3)).sum
    assert(math.abs(m("quality_mass").asInstanceOf[Double] - recount) <= 1e-9,
      s"observed=${m("quality_mass")} recount=$recount")
  }

  test("streaming observe(): per-micro-batch metrics ride the progress events") {
    // the streaming face of the same surface: a live ingest job reports
    // its per-batch row/value accounting through StreamingQueryProgress
    // without a second pass over the batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Double)]
    val observed = in.toDS().toDF("id", "v")
      .observe("ingest-accounting",
        count(lit(1)).as("n_rows"), sum(col("v")).as("v_mass"))
    val q = observed.writeStream.format("memory")
      .queryName("obs_sink").outputMode("append").start()
    try {
      in.addData((1L, 1.5), (2L, 2.5), (3L, 4.0))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("ingest-accounting")
      assert(m != null, "no observed metrics on the progress event")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Double]("v_mass") == 8.0)
    } finally q.stop()
  }
}

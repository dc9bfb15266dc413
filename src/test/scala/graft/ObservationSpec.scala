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
}

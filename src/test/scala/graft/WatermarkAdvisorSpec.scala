package graft

import org.apache.spark.sql.functions._

/** Pins st23 (watermark-lateness advisor): the two-phase distributed
  * prefix max equals a sequential replay of the derived arrival
  * stream, and the survival curve obeys its structural laws. */
class WatermarkAdvisorSpec extends SparkSpec {

  private lazy val rows = ops.EventStreams.st23.run(spark, sf).collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("st23: two-phase prefix max equals a sequential arrival replay") {
    val raw = model.Tables.events(spark, sf)
    val ev = raw.selectExpr("event_id",
        s"${ops.EventStreams.eventMicrosSql(raw)} AS em")
      .selectExpr("event_id", "em",
        """em + (CAST(conv(substr(md5(concat('st23:',
          | CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)
          | % 600000000) - 300000000 AS arr"""
          .stripMargin.replace("\n", " "))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential replay in (arr, event_id) order — the ground truth
    // the bucketed two-phase computation must reproduce exactly
    var hw = Long.MinValue
    var late = Map.empty[Long, Long] // wm -> dropped
    val cands = Seq(0L, 60L, 300L, 600L)
    for ((_, em, _) <- ev.sortBy(e => (e._3, e._1))) {
      val lat = if (hw == Long.MinValue) 0L else math.max(0L, hw - em)
      for (c <- cands if lat > c * 1000000L)
        late = late.updated(c, late.getOrElse(c, 0L) + 1)
      hw = math.max(hw, em)
    }
    for (c <- cands)
      assert(rows(c)._2 == late.getOrElse(c, 0L),
        s"wm=$c: op ${rows(c)._2} vs replay ${late.getOrElse(c, 0L)}")
  }

  test("st23: survival laws — monotone, jitter-bounded, ppm arithmetic") {
    val cands = Seq(0L, 60L, 300L, 600L)
    assert(rows.keySet == cands.toSet)
    val n = rows(0L)._1
    assert(cands.forall(rows(_)._1 == n), "n_events differs across rows")
    // dropped is non-increasing in the delay
    val dropped = cands.map(rows(_)._2)
    assert(dropped == dropped.sorted.reverse, s"not monotone: $dropped")
    // the jitter is bounded in (-300 s, +300 s], so no event can be
    // later than 600 s — the widest candidate must drop nothing
    assert(rows(600L)._2 == 0L, "jitter bound violated")
    // the sweep is non-vacuous on this corpus
    assert(rows(0L)._2 > 0L, "no late events — advisor is vacuous")
    for (c <- cands)
      assert(rows(c)._3 == rows(c)._2 * 1000000L / n, s"ppm at $c")
  }
}

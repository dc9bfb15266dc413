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

  test("st24: gap histogram laws and a sequential per-user recompute") {
    val rows = ops.EventStreams.st24.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    // ceil law + coverage monotone to exactly 1e6 on the last bucket
    rows.foreach { case (b, ceil, _, _, _) =>
      assert(ceil == (if (b == 0) 1L else 1L << b.toInt), s"ceil at $b")
    }
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    assert(rows.last._4 == 1000000L)
    // exactly one recommended bucket: the first covering >= 90%
    val rec = rows.filter(_._5)
    assert(rec.length == 1)
    assert(rec.head._4 >= 900000L)
    rows.takeWhile(!_._5).foreach(r => assert(r._4 < 900000L))
    // gap count conservation: every user contributes (events - 1) gaps
    val raw = model.Tables.events(spark, sf)
    val perUser = raw.groupBy("user_id").count().collect()
      .map(_.getLong(1))
    assert(rows.map(_._3).sum == perUser.map(_ - 1).sum)
    // sequential recompute of one user's gaps lands in the right buckets
    import org.apache.spark.sql.functions.col
    val uid = raw.select("user_id").limit(1).collect()(0).getLong(0)
    val times = raw.filter(col("user_id") === uid)
      .selectExpr(s"${ops.EventStreams.eventMicrosSql(raw)} AS em",
        "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val gaps = times.sliding(2).map { case Array(a, b) => (b._1 - a._1) / 1000000L }.toSeq
    def bucketOf(g: Long): Long =
      (0 until 21).find(o => g < (1L << o)).getOrElse(21).toLong
    val expect = gaps.groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
    val hist = rows.map(r => r._1 -> r._3).toMap
    expect.foreach { case (b, n) =>
      assert(hist.getOrElse(b, 0L) >= n, s"bucket $b holds fewer than user $uid's $n")
    }
  }
}

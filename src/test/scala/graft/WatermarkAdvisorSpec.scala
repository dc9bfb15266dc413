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
    val ev = ops.EventStreams.arrivalStream(spark, sf)
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

  test("st23 observed twin: the runtime's watermark drops match the advisor's rule") {
    // r9 verdict #7: st23 PREDICTS drops from a model of the watermark
    // (exclusive prefix max over arrival order). This drives the ACTUAL
    // Structured Streaming runtime over the same derived arrival stream
    // and reads StreamingQueryProgress.stateOperators
    // .numRowsDroppedByWatermark. One event per micro-batch makes
    // Spark's batch-end watermark coincide with the advisor's per-row
    // high-water mark, with ONE documented divergence: the runtime
    // tracks the high-water mark at MILLISECOND granularity (event
    // times floor to ms in EventTimeStats; the drop predicate is
    // em < wm_ms·1000), while the advisor is micro-exact. The spec
    // therefore recomputes expected drops under BOTH rules, asserts no
    // prefix event sits inside the sub-ms divergence window, and then
    // requires observed == ms-rule == advisor-rule.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val W = 60L // seconds; a mid candidate with nonzero drops (st23 row)
    val prefix = ops.EventStreams.arrivalStream(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._3, e._1))
      .take(80)
    var hwUs = Long.MinValue // advisor model: micro-exact prefix max
    var hwMs = Long.MinValue // runtime model: ms-floored prefix max
    var expAdvisor = 0L
    var expRuntime = 0L
    for ((_, em, _) <- prefix) {
      if (hwUs != Long.MinValue) {
        if (hwUs - em > W * 1000000L) expAdvisor += 1
        if (em < (hwMs - W * 1000L) * 1000L) expRuntime += 1
        // no event may sit within the 1 ms window where the two rules
        // could disagree (or exactly on the advisor boundary)
        assert(math.abs((hwUs - em) - W * 1000000L) > 1000L,
          s"event at ${hwUs - em} us lateness is inside the ms-floor " +
            "divergence window — pick a different prefix/candidate")
      }
      hwUs = math.max(hwUs, em)
      hwMs = math.max(hwMs, em / 1000L)
    }
    assert(expAdvisor == expRuntime,
      s"ms-floor semantics diverged: advisor $expAdvisor vs runtime-rule " +
        s"$expRuntime despite the guard")
    assert(expAdvisor > 0, "prefix has no late events — twin is vacuous")
    val in = MemoryStream[(Long, Long)]
    val agg = in.toDF().toDF("event_id", "em")
      .selectExpr("timestamp_micros(em) AS ts")
      .withWatermark("ts", s"$W seconds")
      .groupBy("ts").count()
    val q = agg.writeStream.format("memory").queryName("st23_observed")
      .outputMode("update").start()
    try {
      // recentProgress retains ~100 entries and each feed can produce a
      // data batch + a no-data watermark batch — harvest per iteration,
      // keyed by batchId, so nothing scrolls out of the buffer
      val dropsByBatch = scala.collection.mutable.Map.empty[Long, Long]
      prefix.foreach { case (id, em, _) =>
        in.addData((id, em))
        q.processAllAvailable()
        q.recentProgress.foreach { p =>
          dropsByBatch(p.batchId) =
            p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        }
      }
      val observed = dropsByBatch.values.sum
      assert(observed == expAdvisor,
        s"runtime dropped $observed, the advisor's rule predicts $expAdvisor")
    } finally q.stop()
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

  test("st26: advisor arithmetic recomputes exactly from a known schedule") {
    import spark.implicits._
    // a dense 10-second schedule with a distinct burst shape
    val perSec = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3).map(_.toLong)
    val arr = perSec.zipWithIndex.flatMap { case (c, s) =>
      (0L until c).map(i => s * 1000000L + i)
    }
    val got = ops.EventStreams.triggerAdvice(arr.toDF("arr")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // by-hand recompute of the advisor's definition
    val n = perSec.sum
    val span = perSec.length.toLong
    val sortedCnt = perSec.sorted
    val p99 = sortedCnt((99 * span / 100).toInt) // ⌈.99·10⌉ = 10th value
    val exp = ops.EventStreams.TriggerCandidatesS.map { t =>
      val est = p99 * t * ops.EventStreams.PerEventCostUs / 1000 +
        ops.EventStreams.TriggerOverheadMs
      (t, n * t / span, p99 * t, p99 * t * 6 / 5, est)
    }
    val okMax = exp.filter(_._5 <= ops.EventStreams.TargetLatencyMs)
      .map(_._1).maxOption.getOrElse(exp.map(_._1).min)
    assert(got.toSeq == exp.map(e => (e._1, e._2, e._3, e._4, e._5,
      e._1 == okMax)), s"advisor table mismatch:\n${got.toSeq}\nvs\n$exp")
    assert(p99 == 9L && got.count(_._6) == 1)
  }

  test("st26 observed twin: a real micro-batch run paced one arrival-second per trigger matches the advisor's rate table") {
    import spark.implicits._
    // the advisor's whole output derives from the per-second rate
    // distribution; this proves that distribution is what the RUNTIME
    // observes, not just what the batch query computed: each
    // arrival-second becomes one file, maxFilesPerTrigger=1 makes each
    // micro-batch exactly one second's admission, and the progress
    // stream's numInputRows must replay the schedule file for file.
    val perSec = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val dir = java.nio.file.Files.createTempDirectory("graft-st26").toString
    val t0 = System.currentTimeMillis() - 60000
    perSec.zipWithIndex.foreach { case (c, s) =>
      val part = s"$dir/sec=$s"
      (0L until c).map(i => s * 1000000L + i).toDF("arr")
        .coalesce(1).write.parquet(part)
      // one data file per second, mtimes ascending: FileStreamSource
      // admits oldest-first, so trigger order IS schedule order
      new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => assert(f.setLastModified(t0 + s * 1000L)))
    }
    val in = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("arr",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/sec=*")
    val q = in.writeStream.format("memory").queryName("st26_observed")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val observed = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(observed == perSec,
      s"runtime batch sizes $observed diverge from the schedule $perSec")
    // the advisor's burst figures are exactly the runtime's: its
    // peak/p99 basis equals the largest observed batch, and the T=1
    // offset cap it recommends admits EVERY observed micro-batch
    val advice = ops.EventStreams.triggerAdvice(
      perSec.zipWithIndex.flatMap { case (c, s) =>
        (0L until c).map(i => s * 1000000L + i) }.toDF("arr")).collect()
    val t1 = advice.find(_.getLong(0) == 1L).get
    assert(t1.getLong(2) == observed.max,
      "p99 burst basis diverged from the observed peak batch")
    assert(observed.forall(_ <= t1.getLong(3)),
      "an observed micro-batch exceeded the advisor's T=1 offset cap")
  }
}

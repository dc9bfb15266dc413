package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins st25's claim that the batch session-dedup IS the streaming
  * computation (same code path, watermark only delays emission), and
  * documents the weaker contract of Spark's cheaper
  * `dropDuplicatesWithinWatermark` (state eviction is watermark-driven
  * and duplicate arrivals EXTEND suppression). */
class StreamDedupSpec extends SparkSpec {

  private val GapUs = ops.EventStreams.DedupGapSec * 1000000L

  test("st25: MemoryStream replay of the session dedup equals the batch twin") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = ops.EventStreams.eventFrame(spark, sf)
      .select("user_id", "event_id", "em").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._3, e._2)) // event-time arrival order
    val in = MemoryStream[(Long, Long, Long)]
    val stream = ops.EventStreams.sessionDedupCore(
      in.toDF().toDF("user_id", "event_id", "em")
        .withColumn("ts", expr("timestamp_micros(em)"))
        .withWatermark("ts", s"${ops.EventStreams.DedupGapSec} seconds"))
    val q = stream.writeStream.format("memory").queryName("st25_replay")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 5)).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      // sentinel far past the horizon flushes every real session
      in.addData((-1L, -1L, events.map(_._3).max + 100L * GapUs))
      q.processAllAvailable()
      val got = spark.table("st25_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 >= 0).sortBy(t => (t._1, t._3, t._2)).toSeq
      val expected = ops.EventStreams.st25.run(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected,
        s"stream admitted ${got.length} vs batch ${expected.length}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: in-order contract — first admitted, gaps > delay") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the two busiest users, replayed one event per micro-batch so the
    // watermark advances deterministically between arrivals
    val byUser = ops.EventStreams.eventFrame(spark, sf)
      .select("user_id", "event_id", "em").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(-_._2.length).take(2)
    val events = byUser.flatMap(_._2).sortBy(e => (e._3, e._2)).take(60)
    val in = MemoryStream[(Long, Long, Long)]
    val df = in.toDF().toDF("user_id", "event_id", "em")
      .withColumn("ts", expr("timestamp_micros(em)"))
      .withWatermark("ts", s"${ops.EventStreams.DedupGapSec} seconds")
      .dropDuplicatesWithinWatermark("user_id")
    val q = df.writeStream.format("memory").queryName("st25_ddww")
      .outputMode("append").start()
    try {
      events.foreach { e => in.addData(e); q.processAllAvailable() }
      val admitted = spark.table("st25_ddww").collect()
        .map(r => (r.getLong(0), r.getLong(2))).sortBy(t => (t._1, t._2))
      // every user's first event is admitted
      for ((u, es) <- byUser) {
        val first = es.map(_._3).min
        if (events.exists(e => e._1 == u))
          assert(admitted.contains((u, events.filter(_._1 == u).map(_._3).min)),
            s"user $u first event not admitted")
      }
      // under in-order arrival, consecutive admitted events of a key are
      // MORE than the delay apart (state holds at least until
      // lastSeenEventTime + delay, and the watermark lags the max event)
      admitted.groupBy(_._1).values.foreach { as =>
        as.map(_._2).sorted.toSeq.sliding(2).foreach {
          case Seq(a, b) => assert(b - a > GapUs,
            s"admitted pair ${b - a} us apart <= delay $GapUs")
          case _ =>
        }
      }
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: duplicate arrivals EXTEND suppression") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Long)]
    val df = in.toDF().toDF("k", "sec")
      .selectExpr("k", "timestamp_seconds(sec) AS ts")
      .withWatermark("ts", "60 seconds")
      .dropDuplicatesWithinWatermark("k")
    val q = df.writeStream.format("memory").queryName("st25_chain")
      .outputMode("append").start()
    try {
      // chain: 1000, 1050 (within 60s -> dropped, extends state),
      // 1095 (>60s after 1000 but within the EXTENDED horizon -> dropped)
      Seq(("a", 1000L), ("a", 1050L), ("a", 1095L), ("z", 9999L))
        .foreach { e => in.addData(e); q.processAllAvailable() }
      val got = spark.table("st25_chain").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000))
        .sortBy(_._2).toSeq
      assert(got == Seq(("a", 1000L), ("z", 9999L)),
        s"chain semantics changed: $got — st25's scaladoc contract is stale")
    } finally q.stop()
  }
}

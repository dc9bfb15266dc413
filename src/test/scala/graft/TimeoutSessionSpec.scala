package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamOps
import graft.streaming.StreamOps.UserEvent

class TimeoutSessionSpec extends SparkSpec {
  import spark.implicits._

  /** Poll until `pred` over the memory table holds. processAllAvailable
    * is unusable here: armed processing-time timeouts keep the engine
    * scheduling wake-up batches, so "all available" never settles. */
  private def awaitRows(table: String, deadlineMs: Long = 30000)(
      pred: Seq[(Long, Long, Double, Boolean)] => Boolean): Seq[(Long, Long, Double, Boolean)] = {
    val end = System.currentTimeMillis() + deadlineMs
    var rows = Seq.empty[(Long, Long, Double, Boolean)]
    while (System.currentTimeMillis() < end && !pred(rows)) {
      Thread.sleep(100)
      rows = spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .toSeq
    }
    rows
  }

  test("flatMapGroupsWithState: sessions close via processing-time timeout") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamOps.sessionsWithTimeout(in.toDS(), timeoutMs = 200)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      in.addData(
        UserEvent(1, "click", 1.0, Timestamp.valueOf("2024-01-01 10:00:00")),
        UserEvent(1, "view", 2.0, Timestamp.valueOf("2024-01-01 10:00:30")))
      val open = awaitRows("sessions")(_.contains((1L, 2L, 3.0, false)))
      assert(open.contains((1L, 2L, 3.0, false)), s"open session not seen: $open")

      // after the 200 ms timeout elapses, a subsequent (empty or data)
      // batch fires the timed-out callback and emits the closed session
      val closed = awaitRows("sessions")(_.contains((1L, 2L, 3.0, true)))
      assert(closed.contains((1L, 2L, 3.0, true)), s"closed session not seen: $closed")

      in.addData(UserEvent(2, "click", 9.0, Timestamp.valueOf("2024-01-01 11:00:00")))
      val u2 = awaitRows("sessions")(_.contains((2L, 1L, 9.0, false)))
      assert(u2.contains((2L, 1L, 9.0, false)))
    } finally q.stop()
  }
}

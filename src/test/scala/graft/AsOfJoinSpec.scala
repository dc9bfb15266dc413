package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: before-any, exact-tie, and latest-wins cases") {
    // (event_id, user, ts, type, value) — ns-scale longs like events.ts
    val rows = Seq(
      (1L, 1L, 100L, "click", 0.0),   // before any signup → null
      (2L, 1L, 200L, "signup", 10.0), // exact tie: sees itself
      (3L, 1L, 300L, "click", 0.0),   // after first signup → 10.0
      (4L, 1L, 400L, "signup", 20.0),
      (5L, 1L, 500L, "click", 0.0),   // latest wins → 20.0
      (6L, 2L, 150L, "click", 0.0))   // other user, no signup → null
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val left = rows.select(col("event_id"), col("user_id"), col("ts"),
      lit(1).as("tag"), lit(null).cast("double").as("v"))
    val right = rows.filter(col("event_type") === "signup")
      .select(lit(null).cast("long").as("event_id"), col("user_id"),
        col("ts"), lit(0).as("tag"), col("value").as("v"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = left.unionByName(right)
      .withColumn("sv", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "sv")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(10.0))
    assert(out(3L).contains(10.0))
    assert(out(5L).contains(20.0))
    assert(out(6L).isEmpty)
  }

  test("q53 tolerance: backward equals q20 filtered by staleness; forward mirrors") {
    import org.apache.spark.sql.functions._
    val Tol = 3600000000L
    val q53 = ops.Relational.q53.run(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // independent reference: collect signups per user, scan per event
    val ev0 = model.Tables.events(spark, sf)
    val ev = ev0.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), ops.EventStreams.eventMicros(ev0).as("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val signups: Map[Long, Seq[(Long, Double)]] = ev
      .filter(_._3 == "signup")
      .groupBy(_._2)
      .map { case (u, es) =>
        u -> es.map(e => (e._5, e._4)).sortBy(_._1).toSeq
      }
    ev.foreach { case (id, uid, _, _, m) =>
      val ss = signups.getOrElse(uid, Seq.empty[(Long, Double)])
      val back = ss.filter(t => t._1 <= m && t._1 >= m - Tol)
        .lastOption.map(_._2)
      val fwd = ss.filter(t => t._1 >= m && t._1 <= m + Tol)
        .headOption.map(_._2)
      assert(q53(id) == ((back, fwd)), s"event $id")
    }
    // the tolerance genuinely fires: q20 finds a match that q53 expires
    val q20 = ops.Relational.q20.run(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(ev.exists { case (id, _, _, _, _) =>
      q20(id).isDefined && q53(id)._1.isEmpty
    }, "no expired backward match on this corpus - tolerance vacuous")
    // and some event has a forward match but no backward one
    assert(q53.values.exists(v => v._1.isEmpty && v._2.nonEmpty))
  }

  test("q54 PIT join: LOCF plan equals an explicit interval range join") {
    val got = ops.Relational.q54.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some((r.getString(2), r.get(3).toString, r.getLong(4))))).toMap
    // alternative plan: materialise dim2 with valid_to and range-join it
    val ev0 = model.Tables.events(spark, sf)
    val ev = ev0.withColumn("ts", ops.EventStreams.eventTs(ev0))
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy("user_id").orderBy("island")
    val dim2 = ev.filter(col("event_type") =!= "purchase")
      .withColumn("chg",
        when(not(lag(col("event_type"), 1).over(wOrd) <=> col("event_type")), 1)
          .otherwise(0))
      .withColumn("island", sum(col("chg")).over(wRun))
      .groupBy("user_id", "event_type", "island")
      .agg(min("ts").as("valid_from"), count(lit(1)).cast("long").as("regime_n"))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wLead),
          lit("9999-12-31 00:00:00")
            .cast(org.apache.spark.sql.types.TimestampNTZType)))
    val exp = ev.filter(col("event_type") === "purchase").as("p")
      .join(dim2.as("v"),
        col("p.user_id") === col("v.user_id") &&
          col("p.ts") >= col("v.valid_from") && col("p.ts") < col("v.valid_to"),
        "left")
      .select(col("p.event_id"), col("v.event_type"), col("v.valid_from"),
        col("v.regime_n"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getString(1), r.get(2).toString, r.getLong(3))))).toMap
    assert(got == exp)
    assert(got.values.exists(_.isDefined), "vacuous: no purchase matched")
  }

  test("q54 PIT edge semantics: before-first, inclusive start, zero-width version") {
    import java.time.LocalDateTime
    def t(sec: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(LocalDateTime.of(2024, 1, 1, 0, 0, sec))
    // user 1: purchase before any version; purchase exactly at a version
    // start; two versions opening at the SAME instant (zero-width first)
    val rows = Seq(
      (1L, 1L, t(5), "purchase", 1.0),  // before first version -> NULL
      (2L, 1L, t(10), "view", 0.0),     // island 0: view @10
      (3L, 1L, t(20), "purchase", 1.0), // inside view regime
      (4L, 1L, t(30), "click", 0.0),    // island 1 opens @30
      (5L, 1L, t(30), "error", 0.0),    // island 2 ALSO opens @30 (zero-width 1)
      (6L, 1L, t(30), "purchase", 1.0), // at the shared boundary -> error regime
      (7L, 1L, t(40), "purchase", 1.0)) // later -> still error regime
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast(
        org.apache.spark.sql.types.TimestampNTZType))
    val dir = java.nio.file.Files.createTempDirectory("q54edge").toString
    // q54 reads dir/events.parquet via Tables.events
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Relational.q54.run(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.toString)).toMap
    assert(out(1L).isEmpty, "purchase before first version must be NULL")
    assert(out(3L).contains("view"))
    assert(out(6L).contains("error"),
      "version opening at the fact instant governs it (inclusive start)")
    assert(out(7L).contains("error"),
      "zero-width version is superseded by its same-instant successor")
  }
}

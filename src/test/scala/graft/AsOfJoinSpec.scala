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
}

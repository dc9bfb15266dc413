package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong)).toDF("k", "v")
    val right = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(left, right, "k", 8, col("v"))
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("two-phase sum equals direct aggregation") {
    val df = (1 to 5000).map(i => (i.toLong % 3, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val twoPhase = Skew.twoPhaseSum(df, "k", "v", 16, col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(twoPhase == direct)
  }

  test("salt derived from columns is deterministic across evaluations") {
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val a = Skew.saltedJoin(df, Seq((1L, "x")).toDF("k", "n"), "k", 4, col("v"))
      .collect().toSeq
    val b = Skew.saltedJoin(df, Seq((1L, "x")).toDF("k", "n"), "k", 4, col("v"))
      .collect().toSeq
    assert(a == b)
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // Salting (above) is the MANUAL skew tool; the other half of the
    // engine's skew story — "AQE for runtime re-plan" (SCALE.md config
    // surface) — is pinned here: a join whose left side piles 95% of its
    // rows on one key must come out of adaptive execution with the skew
    // split actually ENGAGED, not just enabled in config. Thresholds are
    // lowered to test scale; the mechanism is identical at 100 TB.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val pad = "x" * 64
      val left = (1 to 40000).map(i =>
        (if (i % 20 == 0) (i % 7).toLong + 1 else 0L, pad)).toDF("k", "pad")
      val right = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's queryExecution (count() would
      // build and execute a different aggregate plan, leaving this one
      // un-run and its adaptive plan non-final)
      assert(joined.collect().length == 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

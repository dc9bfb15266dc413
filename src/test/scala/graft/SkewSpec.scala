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
}

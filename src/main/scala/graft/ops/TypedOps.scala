package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.TopKByScore
import graft.model.Tables

/** Typed `Dataset`/`Aggregator` surface demos (SURVEY.md §2.9 "UDTF
  * category generally → `mapPartitions`/`Aggregator`"). */
object TypedOps {

  /** Per-customer top-3 orders via the custom [[TopKByScore]] Aggregator.
    * Same result as a row_number window (the oracle), but the bounded
    * buffer means partial aggregation ships ≤ k rows per (group,
    * partition) instead of sorting whole partitions — the shape you want
    * when groups are huge and k is small. */
  val ty01 = Q("ty01_topk_aggregator",
    """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         CAST(row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
      |  FROM orders)
      |WHERE rank <= 3
      |ORDER BY o_custkey, rank""".stripMargin) { (s, d) =>
    import s.implicits._
    val topk = new TopKByScore(3)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("topk"))
      .toDF("o_custkey", "topk")
      .select(col("o_custkey"), posexplode(col("topk")))
      .select(col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("o_custkey", "rank")
  }

  def all: Seq[Q] = Seq(ty01)
}

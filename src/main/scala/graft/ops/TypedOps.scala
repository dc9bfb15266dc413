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

  /** Typed views for [[ty02]] — schema-checked at analysis time by the
    * Encoders (a misspelled column fails the `.as[]`, not a night-3
    * production run). */
  case class COrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
  case class Cust(c_custkey: Long, c_name: String)
  case class CustOrders(c_custkey: Long, c_name: String, n_orders: Long,
      total_cents: Long, max_order_cents: Long)

  /** Typed joinWith + groupByKey/mapGroups — the OTHER §2.9 typed-tier
    * dataflow (ty01 covers the custom Aggregator): `joinWith` keeps
    * both sides as CASE CLASSES through the join (no Row field-index
    * arithmetic), and `mapGroups` folds each customer's order group in
    * plain Scala. The honest scale note is IN the op: `mapGroups`
    * cannot partial-aggregate — every order row crosses the shuffle,
    * where ty01's Aggregator (and any untyped agg) combines map-side;
    * the spec pins BOTH that this typed plan carries no partial
    * aggregate and that its result equals the untyped aggregation
    * row-for-row — the API-choice cost, measured, which is exactly
    * what §2.9 says to know before reaching for typed groups. Money
    * folds through cents Longs (the repo money convention) so the
    * Scala fold is order-free-exact like the engines' DECIMAL sums. */
  val ty02 = Q("ty02_typed_join_groups",
    """SELECT c.c_custkey, c.c_name,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
      |           AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(max(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
      |           AS BIGINT)) AS BIGINT) AS max_order_cents
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice").as[COrder]
    val custs = Tables.customer(s, d)
      .select("c_custkey", "c_name").as[Cust]
    orders
      .joinWith(custs, orders("o_custkey") === custs("c_custkey"))
      .groupByKey { case (_, c) => (c.c_custkey, c.c_name) }
      .mapGroups { (key: (Long, String), rows: Iterator[(COrder, Cust)]) =>
        var n = 0L; var total = 0L; var mx = Long.MinValue
        rows.foreach { case (o, _) =>
          // valueOf = shortest-decimal, the same reading Spark's
          // double→DECIMAL cast takes, so the fold agrees with the
          // oracle's CAST(... AS DECIMAL(12,2)) on every stored value
          val cents = java.math.BigDecimal.valueOf(o.o_totalprice)
            .setScale(2, java.math.RoundingMode.HALF_UP)
            .movePointRight(2).longValueExact()
          n += 1; total += cents; if (cents > mx) mx = cents
        }
        CustOrders(key._1, key._2, n, total, mx)
      }
      .toDF()
      .orderBy("c_custkey")
  }

  def all: Seq[Q] = Seq(ty01, ty02)
}

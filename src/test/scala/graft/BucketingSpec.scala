package graft

import org.apache.spark.sql.functions._

import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem joins with zero shuffle exchange") {
    val o = model.Tables.orders(spark, sf)
    val li = model.Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(li, "lineitem_b", "o_orderkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b",
      "o_orderkey")
    // result parity with the plain (shuffling) join
    val plain = o.join(li, "o_orderkey")
    assert(joined.count() == plain.count())
    // the point of bucketing: no shuffle below the join
    assert(Bucketing.hasNoShuffle(joined.groupBy("o_orderkey").count()),
      joined.queryExecution.executedPlan.toString.take(2000))
  }
}

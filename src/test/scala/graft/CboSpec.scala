package graft

import org.apache.spark.sql.functions._

/** Pins Spark's cost-based optimizer surface against the engine's
  * statistics story (q58 profiler, q62 moments, q64 histogram, q65
  * selectivity): ANALYZE-collected table/column statistics must
  * actually CHANGE a plan — join reorder is the canonical consumer.
  * Without row-count statistics the optimizer preserves the written
  * join order; with them (and a selective dimension filter whose
  * selectivity the column stats expose), CostBasedJoinReorder moves
  * the filtered dimension ahead of the fact-fact join. */
class CboSpec extends SparkSpec {

  test("ANALYZE statistics engage cost-based join reorder") {
    val sp = spark
    val conf = sp.conf
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    def joinOrder(plan: String): Seq[String] =
      Seq("cbo_ord", "cbo_sup").sortBy(t => plan.indexOf(t))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // order matters
      Seq("cbo_li", "cbo_ord", "cbo_sup").foreach(t =>
        sp.sql(s"DROP TABLE IF EXISTS $t"))
      model.Tables.lineitem(sp, sf)
        .select("l_orderkey", "l_suppkey", "l_quantity")
        .write.saveAsTable("cbo_li")
      model.Tables.orders(sp, sf).select("o_orderkey", "o_custkey")
        .write.saveAsTable("cbo_ord")
      model.Tables.supplier(sp, sf).select("s_suppkey", "s_nationkey")
        .write.saveAsTable("cbo_sup")
      // a nation that actually has suppliers on this corpus — the
      // filter must be selective but non-empty for the sanity answer
      val nat = model.Tables.supplier(sp, sf)
        .agg(min("s_nationkey")).collect()(0).get(0)
      // written order: fact x fact FIRST, the filtered dim LAST
      val q =
        s"""SELECT sum(l.l_quantity) AS qty
          |FROM cbo_li l
          |JOIN cbo_ord o ON o.o_orderkey = l.l_orderkey
          |JOIN cbo_sup s ON s.s_suppkey = l.l_suppkey
          |WHERE s.s_nationkey = $nat""".stripMargin
      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // no statistics collected yet -> reorder cannot engage (it needs
      // row counts on every joined table); written order survives
      val before = sp.sql(q).queryExecution.optimizedPlan.toString
      Seq("cbo_li", "cbo_ord", "cbo_sup").foreach { t =>
        sp.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      }
      sp.sql("ANALYZE TABLE cbo_sup COMPUTE STATISTICS FOR COLUMNS s_nationkey, s_suppkey")
      sp.sql("ANALYZE TABLE cbo_li COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_suppkey")
      sp.sql("ANALYZE TABLE cbo_ord COMPUTE STATISTICS FOR COLUMNS o_orderkey")
      val after = sp.sql(q).queryExecution.optimizedPlan.toString
      assert(joinOrder(before) == Seq("cbo_ord", "cbo_sup"),
        s"written order not preserved without stats:\n${before.take(900)}")
      assert(joinOrder(after) == Seq("cbo_sup", "cbo_ord"),
        "CBO did not move the filtered dimension ahead of the fact-fact " +
          s"join:\n${after.take(900)}")
      // semantics invisible: both plans produce the same answer
      val r = sp.sql(q).collect()(0).getDouble(0)
      assert(r > 0.0)
    } finally {
      Seq("cbo_li", "cbo_ord", "cbo_sup").foreach(t =>
        sp.sql(s"DROP TABLE IF EXISTS $t"))
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}

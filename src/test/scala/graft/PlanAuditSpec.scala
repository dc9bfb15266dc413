package graft

/** Locks in the plan-shape properties the scale design depends on
  * (SCALE.md): filter pushdown, column pruning, broadcast dims, top-k
  * without global sort, single-shuffle as-of. A refactor that silently
  * reintroduces a shuffle or loses pushdown fails here, not in a later
  * round's benchmark. */
class PlanAuditSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val q = SparkEntry.catalog.find(_.name == name).get
    q.run(spark, sf).queryExecution.executedPlan.toString
  }

  test("q06: whole WHERE clause pushes to the parquet scan, columns pruned") {
    val plan = executedPlan("q06_forecast_revenue")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(800))
    // projection prunes to the 4 referenced columns
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      plan.take(1500))
  }

  test("q03/q05: dimension joins broadcast (no fact-side shuffle for dims)") {
    assert(executedPlan("q03_shipping_priority").contains("BroadcastHashJoin"))
    assert(executedPlan("q05_region_volume").contains("BroadcastHashJoin"))
  }

  test("q02: top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan("q02_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("q20: as-of join is a single shuffle before the window") {
    val plan = executedPlan("q20_asof_join")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 hash shuffle, got $shuffles:\n${plan.take(1200)}")
  }

  test("s02: LSH candidates come from an equi-join on bucket") {
    val plan = executedPlan("s02_lsh_topk")
    assert(plan.contains("HashJoin"), plan.take(800))
    assert(!plan.contains("NestedLoop"), plan.take(800))
  }
}

package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Catalog-WIDE structural plan audit. PlanAuditSpec proves specific
  * queries plan the way their scaladocs claim; this spec sweeps every
  * catalog entry for the one plan shape that is never survivable at
  * estate scale no matter which query it hides in: a condition-less
  * (cartesian) join where BOTH sides can be corpus-sized. The sweep
  * builds each query's optimized plan at sf0.001 — op bodies with
  * eager artifact writes do run, so this is also a catalog-wide
  * smoke build.
  *
  * A condition-less join is allowed iff the author made its smallness
  * checkable: either Catalyst can BOUND one side (`maxRows` ≤ 10k —
  * global aggregates, literal relations, limits), or the join carries
  * an explicit broadcast hint (the repo convention for data-derived
  * small sides like centroid tables — greppable, reviewable, and the
  * planner turns it into BroadcastNestedLoopJoin with the small side
  * in memory rather than a shuffled cartesian). */
class CatalogPlanSpec extends SparkSpec {

  private val SmallSideRows = 10000L

  test("no catalog query cartesian-joins two potentially corpus-sized sides") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    var allowed = 0
    for (q <- SparkEntry.catalog) {
      val df =
        try q.run(spark, sf)
        catch {
          case e: Exception =>
            fail(s"${q.name}: failed to build a plan at $sf: $e")
        }
      df.queryExecution.optimizedPlan.foreach {
        case j: Join if j.condition.isEmpty =>
          val bounded = Seq(j.left, j.right)
            .exists(_.maxRows.exists(_ <= SmallSideRows))
          val hinted = Seq(j.hint.leftHint, j.hint.rightHint)
            .flatten.exists(_.strategy.nonEmpty)
          if (!bounded && !hinted)
            offenders += s"${q.name}: ${j.joinType} join without " +
              s"condition, bound, or hint\n  left=${j.left.nodeName} " +
              s"right=${j.right.nodeName}"
          else allowed += 1
        case _ => ()
      }
    }
    // anti-vacuity: the repo has many deliberate bounded/hinted
    // scalar-attach cross joins — a walker that sees none is broken,
    // not a clean catalog
    assert(allowed > 10,
      s"walker saw only $allowed condition-less joins — match broken?")
    info(s"$allowed bounded/hinted cross joins allowed, 0 offenders " +
      s"across ${SparkEntry.catalog.size} queries")
    assert(offenders.isEmpty,
      s"${offenders.size} unbounded cartesian join(s):\n" +
        offenders.mkString("\n"))
  }
}

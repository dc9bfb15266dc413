package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Scratch diagnostic sweep (round 14): list every catalog query whose
  * Window/WindowGroupLimit stage sits over a broadcast join with no
  * exchange in between — the shape the first full-catalog 16× pass
  * caught running a multi-minute single task. Not an assertion suite;
  * prints candidates for adjudication. */
class WindowPinSweep extends SparkSpec {

  private def initial(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def pinned(n: SparkPlan): Option[String] = n match {
    case _: ShuffleExchangeLike => None
    case _: SortMergeJoinExec | _: ShuffledHashJoinExec => None
    case j: BroadcastHashJoinExec => Some(j.nodeName)
    case j: BroadcastNestedLoopJoinExec => Some(j.nodeName)
    case l if l.children.isEmpty => None
    case other => other.children.view.flatMap(pinned).headOption
  }

  test("sweep: window stages pinned to broadcast-join width") {
    for (q <- SparkEntry.catalog) {
      val hits =
        try initial(q.run(spark, sf)).collect {
          case w: WindowGroupLimitExec if pinned(w.child).isDefined =>
            s"WindowGroupLimit over ${pinned(w.child).get}"
          case w: WindowExec if pinned(w.child).isDefined =>
            s"Window over ${pinned(w.child).get}"
        }
        catch { case e: Exception => Seq(s"PLANFAIL: $e") }
      if (hits.nonEmpty) info(s"${q.name}: ${hits.distinct.mkString("; ")}")
    }
  }
}

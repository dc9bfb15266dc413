package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Dev-tool main: list every catalog query whose physical plan contains
  * a WINDOW node (WindowExec / WindowGroupLimitExec) that requires a
  * single partition (empty partitionSpec) — the shape behind the
  * round-15 finding that one catalog query serialises a pair-sized
  * sort onto one task at 16× (a global row_number/rank's sort runs on
  * ONE task regardless of cluster width; harmless when the input is
  * dimension-sized, a scale wall when a join multiplied the rows).
  * Plans only — nothing is executed. Artifact-building queries whose
  * run() drives jobs during construction can be skipped via
  * SPARK_GRAFT_SCAN_SKIP.
  *
  * Usage: runMain graft.WindowWidthScan <sfDir>
  */
object WindowWidthScan {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = sys.env.getOrElse("SPARK_GRAFT_SCAN_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

    def initial(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case x => x
    }
    // the №20 walk, retargeted: does this node's width-setting chain
    // pass THROUGH a broadcast join to a leaf? (then its width is the
    // probe scan's split count while the join multiplied the rows)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    def pinned(n: SparkPlan, passed: Option[String] = None): Option[String] =
      n match {
        case _: ShuffleExchangeLike => None
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => None
        case j: BroadcastHashJoinExec =>
          val streamed = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
          }
          pinned(streamed, Some(j.nodeName))
        case j: BroadcastNestedLoopJoinExec =>
          val streamed = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
          }
          pinned(streamed, Some(j.nodeName))
        case l if l.children.isEmpty => passed
        case other =>
          other.children.view.flatMap(pinned(_, passed)).headOption
      }
    for (q <- SparkEntry.catalog if !skip(q.name)) {
      try {
        val plan = initial(q.run(spark, sfDir).queryExecution.executedPlan)
        val hits = plan.collect {
          case w: WindowGroupLimitExec
              if pinned(w.child).isDefined =>
            s"PARTIAL-RANK-AT-SCAN-WIDTH over ${pinned(w.child).get} " +
              s"(partitionBy=${w.partitionSpec.mkString(",").take(40)})"
          case w: WindowExec if pinned(w.child).isDefined =>
            s"WINDOW-AT-SCAN-WIDTH over ${pinned(w.child).get} " +
              s"(partitionBy=${w.partitionSpec.mkString(",").take(40)})"
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            s"WindowGroupLimit(global)"
          case w: WindowExec
              if w.windowExpression.nonEmpty && w.partitionSpec.isEmpty =>
            s"Window(global)"
        }
        if (hits.nonEmpty)
          println(s"${q.name}: ${hits.distinct.mkString(" | ")}")
      } catch { case e: Exception =>
        println(s"${q.name}: SCAN-ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}

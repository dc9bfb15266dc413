package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-tool main for SCALE.md №20: the before/after measurement of the
  * er-family comparator widening (`spark.graft.er.widen`), with the
  * TASK-COUNT witness the r13 verdict asked for — the stage that burns
  * the CPU (the banded-edit-distance comparator, ~10⁸ DPs at 16×) must
  * run at shuffle-partition width after the fix, and the r13 finding
  * was precisely that it ran as ONE task before it.
  *
  * Usage: runMain graft.ErScaleProbe <sfDir> <widen: true|false>
  * Emits one JSON line: wall seconds for er01's links() pass plus the
  * completed stages' (tasks, cpu-seconds) ranked by CPU — the
  * comparator is the top CPU stage, identified by evidence, not by
  * name. min-of-1 by design: the before shape at 16× is minutes long
  * and the question is a 30× structural delta, not a ±10% timing. */
object ErScaleProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ErScaleProbe <sfDir> <widen>")
    val sfDir = args(0)
    val widen = args(1).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.er.widen", widen.toString)

    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += ((i.stageId, i.numTasks,
          i.taskMetrics.executorCpuTime / 1e9))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup the reader/codegen on an unrelated table so the measured
    // pass is the er dataflow, not classloading
    spark.read.parquet(s"$sfDir/nation.parquet").count(): Unit

    val t0 = System.nanoTime()
    graft.ops.EntityResolution.links(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // listener events are async — quiesce the bus (reflective
    // waitUntilEmpty with a stabilization-poll fallback, ProbeSync)
    // so the final stage-completed event cannot be dropped from the
    // task-count witness
    ProbeSync.awaitQuiesce(spark, () => stages.size)

    val top = stages.sortBy(-_._3).take(5)
      .map { case (id, n, cpu) =>
        s"""{"stage":$id,"tasks":$n,"cpu_sec":${f"$cpu%.1f"}}""" }
      .mkString("[", ",", "]")
    val comparatorTasks = stages.sortBy(-_._3).headOption.map(_._2)
      .getOrElse(-1)
    println(s"""{"metric":"er_width_probe","sf":"$sfDir",""" +
      s""""widen":$widen,"wall_sec":${f"$sec%.1f"},""" +
      s""""comparator_stage_tasks":$comparatorTasks,""" +
      s""""top_cpu_stages":$top}""")
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-tool main: run ONE catalog query ONCE with a stage listener and
  * emit wall seconds + the completed stages' (tasks, cpu-seconds)
  * ranked by CPU. The generic sibling of [[ErScaleProbe]] — used for
  * the SCALE.md before/after records where a min-of-3 BENCH_ONLY run
  * is disproportionate (the question is a structural 30× delta in ONE
  * stage's width, and the pre-fix shape costs tens of minutes per rep).
  *
  * Usage: runMain graft.StageProbe <queryName> <sfDir>
  */
object StageProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <queryName> <sfDir>")
    val name = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.fasthash", "true")
    spark.conf.set("spark.graft.validation.cap.docs", "5000")
    spark.conf.set("spark.graft.validation.cap.vecs", "2000")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })
    val q = SparkEntry.catalog.find(_.name == name)
      .getOrElse(sys.error(s"no catalog query named $name"))

    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += ((i.stageId, i.numTasks,
          i.taskMetrics.executorCpuTime / 1e9))
      }
    })

    spark.read.parquet(s"$sfDir/nation.parquet").count(): Unit
    val t0 = System.nanoTime()
    q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    ProbeSync.awaitQuiesce(spark, () => stages.size)

    val top = stages.sortBy(-_._3).take(5)
      .map { case (id, n, cpu) =>
        s"""{"stage":$id,"tasks":$n,"cpu_sec":${f"$cpu%.1f"}}""" }
      .mkString("[", ",", "]")
    val hotTasks = stages.sortBy(-_._3).headOption.map(_._2).getOrElse(-1)
    println(s"""{"metric":"stage_probe","query":"$name","sf":"$sfDir",""" +
      s""""wall_sec":${f"$sec%.1f"},"hot_stage_tasks":$hotTasks,""" +
      s""""top_cpu_stages":$top}""")
  }
}

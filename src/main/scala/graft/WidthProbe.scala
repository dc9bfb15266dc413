package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-tool main: run a list of catalog queries ONCE each (bench
  * conditions: noop sink, fasthash, validation caps) with a stage/job
  * listener and emit one JSON line per query:
  *
  *   wall seconds, job count, stage count, task count, total executor
  *   CPU seconds, the CPU share of SINGLE-TASK stages, and the top-3
  *   stages by CPU as (tasks, cpu).
  *
  * Purpose (r16 optimization round): the sf0.1 tables are single
  * row-group parquet files, so every scan stage is 1 task no matter the
  * master's core count — CPU-dense expressions evaluated below the
  * first exchange (digest packs, shingle/token explodes, fingerprints)
  * serialise onto one core. `one_task_cpu_share` makes that measurable
  * per query across the whole catalog in one JVM, where [[StageProbe]]
  * answers the same question one query at a time.
  *
  * Usage: runMain graft.WidthProbe <sfDir> [name,name,...|all]
  */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: WidthProbe <sfDir> [names|all]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.fasthash", "true")
    spark.conf.set("spark.graft.validation.cap.docs", "5000")
    spark.conf.set("spark.graft.validation.cap.vecs", "2000")
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") SparkEntry.catalog.map(_.name)
      else args(1).split(",").map(_.trim).toSeq
    val byName = SparkEntry.catalog.map(q => q.name -> q).toMap

    val stages = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += ((i.numTasks, i.taskMetrics.executorCpuTime / 1e9))
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
    })

    // warmup: parquet reader, shuffle, codegen
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"no catalog query named $n"))
      ProbeSync.awaitQuiesce(spark, () => stages.size)
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        ProbeSync.awaitQuiesce(spark, () => stages.size)
        val snap = stages.toSeq
        val cpu = snap.map(_._2).sum
        val oneTaskCpu = snap.filter(_._1 <= 1).map(_._2).sum
        val top = snap.sortBy(-_._2).take(3)
          .map { case (t, c) => s"""[$t,${fmt(c)}]""" }
          .mkString("[", ",", "]")
        println(s"""{"q":"$n","wall":${fmt(sec)},"jobs":$jobs,""" +
          s""""stages":${snap.size},"tasks":${snap.map(_._1).sum},""" +
          s""""cpu":${fmt(cpu)},"one_task_cpu":${fmt(oneTaskCpu)},""" +
          s""""top":$top}""")
      } catch { case e: Throwable =>
        println(s"""{"q":"$n","error":"${e.getClass.getSimpleName}"}""")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}

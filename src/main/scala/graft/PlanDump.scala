package graft

import org.apache.spark.sql.SparkSession

/** Dev-tool main: print a catalog query's formatted physical plan at a
  * given sf dir without executing it — the .explain counterpart of
  * StageProbe for diagnosing width collapses that only appear at a
  * corpus size (round-15: s08's comparator stage measured 1-task at
  * 16× despite the №20 input exchange).
  *
  * Usage: runMain graft.PlanDump <queryName>[,name2,...] <sfDir> [outDir]
  *
  * With a comma-separated name list and an `outDir`, one JVM dumps every
  * named query's plan to `outDir/<name>.txt` (r16: the optimization
  * round's `plans/r16/<query>_{before,after}.txt` evidence files are
  * produced in one pass instead of one sbt launch per query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <names> <sfDir> [outDir]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.fasthash", "true")
    spark.conf.set("spark.graft.validation.cap.docs", "5000")
    spark.conf.set("spark.graft.validation.cap.vecs", "2000")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length >= 3) Some(args(2)) else None
    outDir.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { name =>
      val q = SparkEntry.catalog.find(_.name == name)
        .getOrElse(sys.error(s"no catalog query named $name"))
      val df = q.run(spark, args(1))
      // SPARK_GRAFT_PLAN_EXEC=1: execute first and print the FINAL
      // adaptive plan (round-16: the №25 collapse exists only in AQE's
      // runtime re-plan — the initial plan showed a healthy 32-wide SMJ
      // while the executed stage ran one task)
      val text = if (sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")) {
        df.queryExecution.executedPlan.execute().count(): Unit
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } else df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(d) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/$name.txt"), text)
          System.err.println(s"[plandump] wrote $d/$name.txt")
        case None => println(text)
      }
    }
    spark.stop()
  }
}

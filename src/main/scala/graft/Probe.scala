package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe; not part of the library surface. Runs one named query
  * (or all) at a scale factor, printing timing — used to isolate plan
  * regressions like codegen-size fallbacks. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val which = if (args.nonEmpty) args(0) else "all"
    val qs = SparkEntry.catalog.filter(q => which == "all" || q.name == which)
    val mode = sys.env.getOrElse("PROBE_MODE", "time")
    qs.foreach { q =>
      if (mode == "explain") {
        println(s"===== ${q.name}")
        q.run(spark, d).explain("formatted")
      } else if (mode == "dump") {
        // single-query verify dump for tools/check.py --no-run iteration
        q.run(spark, d).coalesce(1).write.mode("overwrite")
          .parquet(s"/tmp/graft_probe/${q.name}")
        q.oracle.foreach(sql => java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/graft_probe/${q.name}.sql"), sql))
        println(s"[probe] dumped ${q.name} -> /tmp/graft_probe/${q.name}")
      } else {
        val t0 = System.nanoTime()
        q.run(spark, d).write.format("noop").mode("overwrite").save()
        println(f"[probe] ${q.name}%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}

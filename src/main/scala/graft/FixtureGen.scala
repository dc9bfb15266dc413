package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** One-shot generator for the repo-committed parquet fixtures that can't
  * be authored by hand (parquet is binary). Idempotent: each fixture is
  * only written if its directory is absent, so re-running never dirties
  * committed bytes. Run via `sbt "runMain graft.FixtureGen"`.
  *
  * Currently generates `fixtures/hive/` — a three-partition
  * hive-partitioned table (`event_date=YYYY-MM-DD/data.parquet`) for the
  * in05 partition-pruning scan. Twelve hand-pinned rows; the partition
  * column lives ONLY in the directory names, exactly how a date-partitioned
  * 100 TB fact table is laid out.
  */
object FixtureGen {
  val hiveFixtureDir = "/root/repo/fixtures/hive"

  /** Files.list with the underlying DirectoryStream closed (the raw
    * stream leaks an fd until GC). */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    } finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeHiveFixture(spark)
    writeCorruptFixture(spark)
    spark.stop()
  }

  val corruptFixtureDir = "/root/repo/fixtures/corrupt"

  /** One valid parquet file + one garbage `.parquet` (deterministic
    * bytes, not parquet at all) in the same directory — the in06
    * corrupt-file-tolerance input. */
  def writeCorruptFixture(spark: SparkSession): Unit = {
    val dest = Paths.get(corruptFixtureDir)
    if (Files.exists(dest)) { println(s"$corruptFixtureDir exists; skipping"); return }
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-corrupt-fixture").toString
    Seq((1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L))
      .toDF("id", "name", "score")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    Files.createDirectories(dest)
    listDir(Paths.get(tmp)).foreach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.copy(p, dest.resolve("good.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
    }
    Files.write(dest.resolve("bad.parquet"),
      "this is not a parquet file and never will be\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $corruptFixtureDir")
  }

  /** (event_id, etype, value, event_date): BIGINTs + VARCHARs only, so no
    * float formatting can drift between engines. */
  def writeHiveFixture(spark: SparkSession): Unit = {
    val dest = Paths.get(hiveFixtureDir)
    if (Files.exists(dest)) { println(s"$hiveFixtureDir exists; skipping"); return }
    import spark.implicits._
    val rows = Seq(
      (1L, "view", 10L, "2024-01-01"), (2L, "click", 25L, "2024-01-01"),
      (3L, "view", 17L, "2024-01-01"), (4L, "buy", 310L, "2024-01-01"),
      (5L, "view", 11L, "2024-01-02"), (6L, "click", 42L, "2024-01-02"),
      (7L, "buy", 150L, "2024-01-02"), (8L, "view", 9L, "2024-01-02"),
      (9L, "click", 33L, "2024-01-02"), (10L, "view", 21L, "2024-01-03"),
      (11L, "buy", 275L, "2024-01-03"), (12L, "click", 38L, "2024-01-03"))
    val tmp = Files.createTempDirectory("graft-hive-fixture").toString
    rows.toDF("event_id", "etype", "value", "event_date")
      .coalesce(1)
      .write.partitionBy("event_date").mode("overwrite").parquet(tmp)
    // stable file names (data.parquet) instead of Spark's uuid part files
    listDir(Paths.get(tmp)).foreach { d =>
      if (Files.isDirectory(d) && d.getFileName.toString.startsWith("event_date=")) {
        val out = dest.resolve(d.getFileName.toString)
        Files.createDirectories(out)
        listDir(d).foreach { p =>
          if (p.getFileName.toString.endsWith(".parquet"))
            Files.copy(p, out.resolve("data.parquet"), StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    println(s"wrote $hiveFixtureDir")
  }
}

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
  val hiveFixtureDir = sources.Ingest.hiveFixtureDir

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
    writeMlFixture(spark)
    writeDimDatesFixture(spark)
    spark.stop()
  }

  /** Copies the single part-file of a freshly-written one-partition
    * parquet dir to a stable standalone file name (Spark part-file names
    * embed UUIDs — unstable bytes for a committed fixture). */
  private def copySingleParquet(tmpDir: String, dest: Path): Unit = {
    listDir(Paths.get(tmpDir)).find(_.getFileName.toString.endsWith(".parquet"))
      .map(p => Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING))
      .getOrElse(sys.error(s"no parquet part file under $tmpDir"))
  }

  /** The ml04 frozen-model fixture (r05 verdict #3): the LR distillation
    * model trained on the sf0.01 corpus — bit-deterministic, so this is
    * reproducible — flattened into four relational tables that make the
    * serving pass `argmax(W·x + b)` expressible in BOTH engines:
    *
    *   - `term_index.parquet` (term, idx): every distinct Tokenizer token
    *     across ALL testdata scale factors, mapped through the model's
    *     own HashingTF bucket function. The corpus vocabulary is a fixed
    *     31-word list, so the table is complete for any serving dir —
    *     `MLFrozenSpec` asserts coverage rather than trusting it.
    *   - `idf.parquet` (idx, idf): the fitted IDFModel vector.
    *   - `coef.parquet` (cls, label, idx, w): the multinomial coefficient
    *     matrix, one row per (class, feature).
    *   - `intercept.parquet` (cls, label, b): the intercept vector.
    *
    * Training stays rows-only (ml01); what this freezes is the SERVING
    * artifact, the piece that is pure linear algebra. */
  def writeMlFixture(spark: SparkSession): Unit = {
    val dest = Paths.get(ops.MLClassify.mlFixtureDir)
    if (Files.exists(dest)) { println(s"$dest exists; skipping"); return }
    import spark.implicits._
    import org.apache.spark.ml.classification.LogisticRegressionModel
    import org.apache.spark.ml.feature.{HashingTF, IDFModel, Tokenizer}
    import org.apache.spark.sql.functions.{col, explode}

    val trainDir = "/root/testdata/sf0.01"
    val (model, labels) =
      ops.MLClassify.fitModel(graft.model.Tables.documents(spark, trainDir))
    val hashing = model.stages.collectFirst { case h: HashingTF => h }
      .getOrElse(sys.error("no HashingTF stage"))
    val idfModel = model.stages.collectFirst { case m: IDFModel => m }
      .getOrElse(sys.error("no IDFModel stage"))
    val lr = model.stages.collectFirst { case m: LogisticRegressionModel => m }
      .getOrElse(sys.error("no LogisticRegressionModel stage"))
    require(lr.coefficientMatrix.numRows == labels.length,
      s"expected a multinomial coefficient matrix (${labels.length} rows), " +
        s"got ${lr.coefficientMatrix.numRows} — binomial collapse would need a 2-row expansion")

    // vocabulary: the EXACT Tokenizer tokens (not a re-implementation)
    // over every scale factor's corpus, so serving at any tested dir
    // finds all its terms
    val tok = new Tokenizer().setInputCol("text").setOutputCol("tokens")
    val terms = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => tok.transform(
        graft.model.Tables.documents(spark, s"/root/testdata/$sf")
          .select(col("text")))
        .select(explode(col("tokens")).as("term")))
      .reduce(_ union _)
      .distinct().as[String].collect().sorted
    println(s"ml fixture: ${terms.length} vocab terms, ${labels.length} classes")

    Files.createDirectories(dest)
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = Files.createTempDirectory(s"graft-ml-$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      copySingleParquet(tmp, dest.resolve(s"$name.parquet"))
    }
    write("term_index",
      terms.toSeq.map(t => (t, hashing.indexOf(t))).toDF("term", "idx"))
    write("idf",
      idfModel.idf.toArray.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
        .toDF("idx", "idf"))
    write("coef", {
      val m = lr.coefficientMatrix
      (for { c <- 0 until m.numRows; j <- 0 until m.numCols }
        yield (c, labels(c), j, m(c, j))).toDF("cls", "label", "idx", "w")
    })
    write("intercept",
      lr.interceptVector.toArray.zipWithIndex
        .map { case (b, c) => (c, labels(c), b) }.toSeq.toDF("cls", "label", "b"))
    println(s"wrote $dest")
  }

  /** Calendar dim for the in08 dynamic-partition-pruning join: one row
    * per hive-fixture partition date plus an attribute (`phase`) that the
    * selective filter lands on. A real parquet file, not an in-memory
    * relation, deliberately: Catalyst's ConvertToLocalRelation folds a
    * Filter over LocalRelation away before the PartitionPruning batch
    * runs, so an inline dim would never trigger DPP. */
  def writeDimDatesFixture(spark: SparkSession): Unit = {
    val dest = Paths.get(sources.Ingest.dimDatesFixturePath)
    if (Files.exists(dest)) { println(s"$dest exists; skipping"); return }
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dim-dates").toString
    Seq(("2024-01-01", "launch"), ("2024-01-02", "steady"),
        ("2024-01-03", "wrap"))
      .toDF("ds", "phase")
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ds")).as("d"),
        org.apache.spark.sql.functions.col("phase"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    copySingleParquet(tmp, dest)
    println(s"wrote $dest")
  }

  val corruptFixtureDir = sources.Ingest.corruptFixtureDir

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

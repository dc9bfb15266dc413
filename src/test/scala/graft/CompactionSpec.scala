package graft

import org.apache.spark.sql.functions._

/** Small-file compaction — the operational pass every streaming parquet
  * sink needs at scale: micro-batches land one file per partition per
  * trigger, and a day of 1-minute triggers turns a 100 TB table into
  * millions of KB-files whose listing/footer overhead dominates reads.
  * The fix is a batch rewrite: read the fragmented table, repartition to
  * the target file count, write alongside, swap. This pins the rewrite's
  * two contracts: content is EXACTLY preserved, and the file count
  * actually drops to the target (st09's documented compaction pointer,
  * made executable). */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
  }

  test("compaction rewrite: identical content, fragmented files collapsed") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate a micro-batched sink: 40 tiny appends, one file each
    (1 to 40).foreach { b =>
      Seq((b.toLong, s"payload-$b", b * 1.5))
        .toDF("id", "payload", "score")
        .coalesce(1).write.mode("append").parquet(s"$root/frag")
    }
    val before = parquetFiles(s"$root/frag")
    assert(before.size >= 40, s"expected ≥40 fragment files, got ${before.size}")

    // the compaction pass: one read, one repartition to the target, one
    // write — at scale the target comes from bytes/128MB, here it's 2
    val frag = spark.read.parquet(s"$root/frag")
    frag.repartition(2).write.mode("overwrite").parquet(s"$root/compact")

    val after = parquetFiles(s"$root/compact")
    assert(after.size == 2, s"expected 2 compacted files, got ${after.size}")
    // content contract: every row survives exactly once
    val a = spark.read.parquet(s"$root/compact")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    val b = frag.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    assert(a == b, "compaction must be a pure rewrite")
    // and the rewrite actually shrank the file inventory ~20x
    assert(after.size * 10 <= before.size)
  }

  test("in09: the operative compaction query preserves content exactly (digest == source digest)") {
    // in09 digests the COMPACTED files; recompute the same digest on
    // the SOURCE table directly — equality proves the fragment+compact
    // round trip lost and duplicated nothing (the file-count contract
    // is require()d inside the query itself, so reaching the digest at
    // all means the inventory shrank to the size-derived target)
    val out = sources.Ingest.in09.run(spark, sf).collect()(0)
    val srcRow = model.Tables.lineitem(spark, sf)
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        sources.Ingest.md5ChecksumOf(
          col("l_orderkey").cast("string"), lit("|"),
          col("l_partkey").cast("string"), lit("|"),
          col("l_suppkey").cast("string"), lit("|"),
          col("l_returnflag")).as("checksum"))
      .collect()(0)
    assert(out.getLong(0) == srcRow.getLong(0), "row count drifted")
    assert(out.getLong(1) == srcRow.getLong(1), "content digest drifted")
    assert(out.getLong(0) > 0)
  }

  test("in13: layouts are content-invariant and the clustered scan is local") {
    import org.apache.spark.sql.functions._
    // the run itself requires(filesHit(sorted) < filesHit(scattered));
    // here: both layouts return identical (n_rows, checksum), equal to a
    // direct recompute off the source table
    val rows = sources.Ingest.in13.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("hash_scattered", "range_sorted"))
    assert(rows("hash_scattered") == rows("range_sorted"))
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    val direct = model.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast(ntz) &&
        col("l_shipdate") < lit("1996-04-01 00:00:00").cast(ntz))
      .agg(count(lit(1)).cast("long"),
        sources.Ingest.md5ChecksumOf(col("l_orderkey").cast("string"),
          lit("|"), col("l_partkey").cast("string")))
      .collect().head
    assert(rows("range_sorted") == ((direct.getLong(0), direct.getLong(1))))
    assert(direct.getLong(0) > 0, "empty month - the scan contract is vacuous")
  }

  test("in14: every format round-trip preserves the source content digest") {
    import org.apache.spark.sql.functions._
    val rows = sources.Ingest.in14.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("json", "orc", "parquet"))
    assert(rows.values.toSet.size == 1, s"formats disagree: $rows")
    val src = model.Tables.lineitem(spark, sf).agg(
        count(lit(1)).cast("long"),
        sources.Ingest.md5ChecksumOf(col("l_orderkey").cast("string"),
          lit("|"), col("l_partkey").cast("string"), lit("|"),
          col("l_suppkey").cast("string"), lit("|"), col("l_returnflag")))
      .collect().head
    assert(rows("parquet") == ((src.getLong(0), src.getLong(1))))
  }
}

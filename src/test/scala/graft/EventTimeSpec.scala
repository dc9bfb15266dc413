package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the dtype-adaptive event-time accessors against BOTH `events.ts`
  * storage generations — raw TIMESTAMP(NANOS)-as-long and native
  * `timestamp[us]` (TIMESTAMP_NTZ) — so a testdata regeneration that flips
  * the physical type cannot silently break the 18 ts-consuming catalog
  * queries again (the round-7 incident). The law: for the same instants,
  * every accessor ([[ops.EventStreams.eventTs]], `eventMicros`,
  * `packedTsKey`, `tsLiteral` filtering) must produce IDENTICAL values on
  * the two encodings, and the live testdata must be covered by one of them.
  */
class EventTimeSpec extends SparkSpec {
  import ops.EventStreams

  // instants chosen to exercise truncation: sub-microsecond nanos tails
  // must floor to the same micros the timestamp[us] file stores
  private val microsVals =
    Seq(1705325400000000L, // 2024-01-15 13:30:00
      1705325400000001L,   // +1 µs — adjacent, must stay distinct
      1705411799999999L,   // end of next day minus 1 µs
      0L)                  // epoch
  private val nanosTails = Seq(0L, 1L, 999L) // sub-µs noise to truncate

  private def nanosDf: DataFrame = {
    val rows = for {
      (us, i) <- microsVals.zipWithIndex
      (tail, j) <- nanosTails.zipWithIndex
    } yield (i.toLong * 10 + j, us * 1000L + tail)
    spark.createDataFrame(rows).toDF("event_id", "ts")
  }

  private def ntzDf: DataFrame = {
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampNTZType)))
    val rows = for {
      (us, i) <- microsVals.zipWithIndex
      (_, j) <- nanosTails.zipWithIndex
    } yield org.apache.spark.sql.Row(i.toLong * 10 + j,
      java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
        (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  private def canon(df: DataFrame): Seq[(Long, String, Long, java.math.BigDecimal)] =
    df.select(col("event_id"), EventStreams.eventTs(df).cast("string"),
        EventStreams.eventMicros(df), EventStreams.packedTsKey(df))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDecimal(3)))
      .sortBy(_._1).toSeq

  test("eventTs/eventMicros/packedTsKey agree across nanos-long and NTZ storage") {
    val a = canon(nanosDf)
    val b = canon(ntzDf)
    assert(a == b, "accessor outputs diverge between storage dtypes")
    // micros stay exact and distinct at ±1 µs resolution
    assert(a.map(_._3).distinct.size == microsVals.size)
    // the packed key is total and unique per event even at tied micros
    assert(a.map(_._4).distinct.size == a.size)
  }

  test("tsLiteral filters match the dtype's native resolution on both encodings") {
    val cut = "2024-01-15T13:30:00Z" // = microsVals(0) exactly
    val keep = (df: DataFrame) =>
      df.filter(col("ts") > EventStreams.tsLiteral(df, cut))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    // nanos storage compares pre-truncation: the sub-µs tails above the
    // exactly-at-cutoff instant survive (ids 1, 2), plus both later
    // instants in full (10..12, 20..22); epoch rows (30..32) drop.
    assert(keep(nanosDf) == Seq(1L, 2L, 10L, 11L, 12L, 20L, 21L, 22L))
    // µs storage has no sub-µs band: only the strictly-later instants.
    assert(keep(ntzDf) == Seq(10L, 11L, 12L, 20L, 21L, 22L))
    // and at micros resolution (the oracle's) the two encodings agree
    val microsKeep = (df: DataFrame) =>
      df.filter(EventStreams.eventMicros(df) > lit(1705325400000000L))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(microsKeep(nanosDf) == microsKeep(ntzDf))
  }

  test("the live testdata dtype is one the accessors support") {
    val dt = model.Tables.events(spark, sf).schema("ts").dataType
    assert(dt == LongType || dt == TimestampNTZType || dt == TimestampType,
      s"events.ts arrived as $dt — extend EventStreams accessors")
  }

  test("parquet round-trip: a timestamp[us] file read back matches the in-memory NTZ frame") {
    val dir = Files.createTempDirectory("graft-evtts").toString
    ntzDf.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(canon(back) == canon(ntzDf))
  }

  test("st17 SCD2 invariants: one current row per user, intervals tile without gaps") {
    // the two laws a type-2 MERGE must preserve, checked on the real
    // corpus: (1) exactly one open (is_current) row per user — a merge
    // that closes without inserting, or inserts without closing, breaks
    // it; (2) per user, sorted by valid_from, every row's valid_to
    // equals the next row's valid_from (the chain tiles: history rows
    // by the lead() construction, the merge seam because the close
    // timestamp IS the inserted row's valid_from), with the sentinel
    // closing the chain.
    val rows = ops.EventStreams.st17.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](2),
        r.getAs[java.time.LocalDateTime](3), r.getBoolean(4)))
    val sentinel = java.time.LocalDateTime.parse("9999-12-31T00:00")
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rs) =>
      assert(rs.count(_._4) == 1, s"user $u has ${rs.count(_._4)} current rows")
      val chain = rs.sortBy(_._2)
      chain.sliding(2).foreach {
        case Array((_, _, to, _), (_, from, _, _)) =>
          assert(to == from, s"user $u: gap/overlap $to -> $from")
        case _ =>
      }
      assert(chain.last._3 == sentinel, s"user $u chain does not end open")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev-tool main: measured THROUGHPUT of the streaming tier — the
  * number the batch tier has had since №20 and streaming never did
  * (r14 verdict ask #7). Replays the sf events table through a
  * `MemoryStream` in fixed-size chunks (one micro-batch each — the
  * Kafka-partition-poll shape the production source would produce)
  * into st01's exact watermarked tumbling-window plan
  * (`EventStreams.st01` semantics: 1 h windows × event_type,
  * count + DECIMAL sum), update mode, noop sink, and reports rows/sec
  * plus batch count. A stateless pass-through replay of the same
  * chunks is measured first so the entry separates micro-batch ENGINE
  * overhead from the stateful aggregation's marginal cost.
  *
  * Usage: runMain graft.StreamThroughputProbe <sfDir> [chunkRows]
  * Emits one JSON line per measured plan.
  */
object StreamThroughputProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamThroughputProbe <sfDir> [chunkRows]")
    val sfDir = args(0)
    val chunkRows = if (args.length > 1) args(1).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // (epoch-micros, event_type, value) rows, driver-side: the replay
    // source must be the driver by MemoryStream's contract; bounded —
    // events is the SMALL table of the corpus (100 k rows at sf0.1)
    val raw = graft.model.Tables.events(spark, sfDir)
    val rows = raw
      .select(ops.EventStreams.eventMicros(raw).as("us"),
        col("event_type"), col("value").cast("double"))
      .as[(Long, String, Double)]
      .collect()
    val chunks = rows.grouped(chunkRows).toSeq
    // r15 advice: an empty events table would run zero micro-batches
    // and NPE on lastProgress — fail with a diagnostic instead
    require(chunks.nonEmpty,
      s"no events rows at $sfDir — nothing to replay")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def replay(name: String,
        plan: org.apache.spark.sql.Dataset[(Long, String, Double)] =>
          org.apache.spark.sql.DataFrame): Unit = {
      val in = MemoryStream[(Long, String, Double)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_stp_").toFile
      val q = plan(in.toDS())
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      val t0 = System.nanoTime()
      chunks.foreach { ch =>
        in.addData(ch.toIndexedSeq)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // chunks.nonEmpty is required above, so ≥1 micro-batch ran and
      // lastProgress is non-null by processAllAvailable's contract
      val batches = q.lastProgress.batchId + 1
      q.stop()
      // r15 advice: the probe used to leak one /tmp checkpoint dir per
      // replay across runs — clean up after the query is stopped
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      println(f"""{"metric":"stream_throughput","plan":"$name","rows":${rows.length},"chunk_rows":$chunkRows,"batches":$batches,"wall_sec":$sec%.1f,"rows_per_sec":${(rows.length / sec).toLong},"sf":"$sfDir"}""")
    }

    // engine-overhead referee: same source, same chunking, no state
    replay("stateless_passthrough", ds =>
      ds.toDF("us", "event_type", "value")
        .select(col("event_type"), col("value")))

    // st01's plan verbatim over the replayed stream: watermark + 1 h
    // tumbling window × event_type, count + exact DECIMAL sum
    replay("st01_tumbling_window", ds =>
      ds.toDF("us", "event_type", "value")
        .withColumn("ts", expr("timestamp_micros(us)"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total_value")))

    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Kafka source/sink bindings (SURVEY.md §2.1/§2.2), carrying the
  * reference's exact connection semantics as configuration:
  *
  *  - ingest stream: topic `general-news-2`, `startingOffsets=latest`,
  *    `failOnDataLoss=false` (`news_categorization_streaming.py:45-51`);
  *  - digest consumer: `startingOffsets=earliest`
  *    (`summary_news_to_telegram.py:50`);
  *  - digest producer: single JSON `value` column to `news-summary`
  *    (`news_summarization_batch.py:121-127`).
  *
  * The sandbox has no broker, so these builders are compile-checked
  * config carriers; tests drive the identical downstream plans from
  * `MemoryStream` (SURVEY.md §7.4 risk 3). At cluster scale, source
  * parallelism = topic partitions; `minPartitions` can oversplit.
  */
object KafkaIO {

  val IngestTopic = "general-news-2"
  val DigestTopic = "news-summary"

  def rawNewsStream(spark: SparkSession, bootstrap: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", IngestTopic)
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")

  def digestStream(spark: SparkSession, bootstrap: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", DigestTopic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")

  /** Digest rows (content, category) → Kafka-shaped frame (JSON value). */
  def toDigestRecords(digests: DataFrame): DataFrame =
    digests.select(to_json(struct(col("content"), col("category"))).as("value"))

  def writeDigests(digests: DataFrame, bootstrap: String): Unit =
    toDigestRecords(digests).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", DigestTopic)
      .save()
}

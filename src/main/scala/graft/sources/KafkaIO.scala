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
  * PERMANENT environment boundary: this sandbox has neither a broker
  * nor the `spark-sql-kafka` connector jars, so broker I/O cannot be
  * exercised end-to-end here at all — the builders are config carriers
  * whose option sets are data (unit-asserted against the reference
  * semantics in `KafkaIOSpec`), and everything INSIDE the boundary is
  * tested: the producer record contract ([[toDigestRecords]] — single
  * STRING `value` column, the exact shape the Kafka sink serializes),
  * the JSON payload round-trip (`JsonRoundTripSpec`), and the identical
  * downstream plans from `MemoryStream` (SURVEY.md §7.4 risk 3). On a
  * real cluster the same builders bind to the connector unchanged; at
  * scale, source parallelism = topic partitions and `minPartitions` can
  * oversplit.
  */
object KafkaIO {

  val IngestTopic = "general-news-2"
  val DigestTopic = "news-summary"

  /** Reference ingest-source options (`news_categorization_streaming
    * .py:45-51`): tail the topic, survive retention-expired offsets. */
  val ingestSourceOptions: Map[String, String] = Map(
    "subscribe" -> IngestTopic,
    "startingOffsets" -> "latest",
    "failOnDataLoss" -> "false")

  /** Reference digest-consumer options (`summary_news_to_telegram
    * .py:50`): replay the summary topic from the beginning. */
  val digestSourceOptions: Map[String, String] = Map(
    "subscribe" -> DigestTopic,
    "startingOffsets" -> "earliest",
    "failOnDataLoss" -> "false")

  def rawNewsStream(spark: SparkSession, bootstrap: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .options(ingestSourceOptions)

  def digestStream(spark: SparkSession, bootstrap: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .options(digestSourceOptions)

  /** Digest rows (content, category) → Kafka-shaped frame: exactly one
    * STRING `value` column (the producer contract the Kafka sink
    * serializes; n05's oracle pins the JSON payload inside it). */
  def toDigestRecords(digests: DataFrame): DataFrame =
    digests.select(to_json(struct(col("content"), col("category"))).as("value"))

  def writeDigests(digests: DataFrame, bootstrap: String): Unit =
    toDigestRecords(digests).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", DigestTopic)
      .save()
}

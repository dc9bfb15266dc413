package graft

import org.apache.spark.sql.types.StringType

import graft.sources.KafkaIO

/** Pins everything about the Kafka boundary that is testable without a
  * broker or connector jars (neither exists in this environment — a
  * PERMANENT boundary, documented in SURVEY.md §2.1): the option sets
  * the builders carry, the producer record contract, and the fact that
  * the builders fail ONLY at connector resolution — i.e. the config
  * path upstream of the missing jar is sound. */
class KafkaIOSpec extends SparkSpec {
  import spark.implicits._

  test("source options carry the reference's exact connection semantics") {
    // ingest: tail the live topic, survive retention-expired offsets
    assert(KafkaIO.ingestSourceOptions == Map(
      "subscribe" -> "general-news-2",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false"))
    // digest consumer: replay the summary topic from the beginning
    assert(KafkaIO.digestSourceOptions == Map(
      "subscribe" -> "news-summary",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false"))
  }

  test("producer records: single STRING value column, JSON round-trips") {
    val digests = Seq(
      ("- headline one\n- headline two\nDate: 2024-01-31", "arts"),
      ("quote\" and \\ backslash", "technology"))
      .toDF("content", "category")
    val records = KafkaIO.toDigestRecords(digests)
    // the Kafka sink serializes exactly this shape: one value column
    assert(records.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("value", StringType)))
    // payload decodes back to the digest rows (consumer side)
    val back = records
      .selectExpr("from_json(value, 'content STRING, category STRING') AS d")
      .selectExpr("d.content", "d.category")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq == Seq(
      ("- headline one\n- headline two\nDate: 2024-01-31", "arts"),
      ("quote\" and \\ backslash", "technology")))
  }

  test("builders are sound up to connector resolution (the env boundary)") {
    // With no spark-sql-kafka jar, source resolution is the FIRST
    // failure point — the builder accepts the options and the plan
    // fails only on the missing data source, proving the config path
    // is wired correctly upstream of the permanent boundary.
    val ex = intercept[Exception](
      KafkaIO.rawNewsStream(spark, "localhost:9092").load())
    assert(ex.getMessage.toLowerCase.contains("kafka"),
      s"expected missing-kafka-connector failure, got: ${ex.getMessage}")
  }
}

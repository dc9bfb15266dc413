package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch ingestion scans (SURVEY.md §2.1).
  *
  * The reference's JSON loader accepts either a whole-file JSON array or
  * JSON-Lines and skips unparseable lines with a warning
  * (`telegram/raw_news_to_telegram.py:34-53`). Spark's JSON reader covers
  * both shapes natively; corrupt records are retained in a side column
  * and filtered, reproducing the tolerant-skip semantics declaratively
  * (so the skip happens in the scan, parallel, instead of a driver loop).
  */
object Ingest {

  /** Tolerant JSON scan: JSONL by default, whole-file arrays with
    * `multiLine`. Bad lines are dropped at parse time (`DROPMALFORMED`) —
    * the same whole-line-skip the reference's loader implements with its
    * per-line `json.loads` retry, but inside the parallel scan. (The
    * PERMISSIVE + filter-on-`_corrupt_record` formulation is a trap:
    * Spark refuses plans whose pruned scan references only the corrupt
    * column, e.g. any downstream `count()`.) */
  def tolerantJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None, multiLine: Boolean = false): DataFrame = {
    val base = spark.read
      .option("mode", "DROPMALFORMED")
      .option("multiLine", multiLine.toString)
    schema.map(base.schema).getOrElse(base).json(path)
  }

  /** Header-aware CSV scan (ref: a deleted predecessor imported `csv`,
    * SURVEY.md §2.1 [EXT]). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** The reference's format projection over the raw article shape
    * (`raw_news_to_telegram.py:58-69`): per-field empty-string defaults,
    * authors list joined with ", " or 'Unknown'. */
  def formatArticles(raw: DataFrame): DataFrame = {
    val authors = when(col("authors").isNotNull && size(col("authors")) > 0,
      array_join(col("authors"), ", ")).otherwise(lit("Unknown"))
    raw.select(concat(
      lit("Headline: "), coalesce(col("headline"), lit("")),
      lit(", Authors: "), authors,
      lit(", Description: "), coalesce(col("short_description"), lit("")))
      .as("value"))
  }
}

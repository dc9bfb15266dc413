package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo from SURVEY.md §2.
  *
  * @param name   stable key, used by the driver's Verify/Bench harness
  * @param run    Spark implementation; `dir` is a testdata scale-factor
  *               directory containing the parquet star schema
  * @param oracle equivalent ANSI SQL runnable by DuckDB on the same parquet
  *               tables; None for ops whose semantics are not
  *               SQL-expressible (driver falls back to a rows-only check)
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

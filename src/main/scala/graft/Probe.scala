package graft

import org.apache.spark.sql.SparkSession

/** Dev-only schema probe; not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[4]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "events", "embeddings", "documents")) {
      println(s"== $t")
      spark.read.parquet(s"$d/$t.parquet").printSchema()
    }
    spark.read.parquet(s"$d/events.parquet")
      .selectExpr("min(ts)", "max(ts)",
        "timestamp_micros(CAST(min(ts) / 1000 AS LONG))").show(false)
    println("entry rows=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}

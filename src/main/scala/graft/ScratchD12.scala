package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY: d12/d17 16x stage attribution (deleted after SCALE.md). */
object ScratchD12 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .appName("scratch-d12").master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf16x")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.model.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val cand = t("d03_run")(
      graft.ops.Dedup.d03.run(spark, d).localCheckpoint())
    println(s"candidates=${cand.count()}")
    val joined = t("join_texts")(cand
      .join(docs.select(col("doc_id").as("i"), col("text").as("ta")), "i")
      .join(docs.select(col("doc_id").as("j"), col("text").as("tb")), "j")
      .localCheckpoint())
    t("verify_banded_fused")(joined
      .select(col("i"), col("j"),
        expr("bounded_edit_distance(ta, tb, 40)").cast("long").as("ed"))
      .filter(col("ed") <= 40).write.format("noop").mode("overwrite").save())
    t("verify_banded_repart")(joined.repartition(64)
      .select(col("i"), col("j"),
        expr("bounded_edit_distance(ta, tb, 40)").cast("long").as("ed"))
      .filter(col("ed") <= 40).write.format("noop").mode("overwrite").save())
    t("verify_unbounded_lev")(joined
      .select(col("i"), col("j"),
        levenshtein(col("ta"), col("tb")).cast("long").as("ed"))
      .filter(col("ed") <= 40).write.format("noop").mode("overwrite").save())
    t("verify_d12_aswritten")({
      // d12's literal shape: select computes lev, filter re-states it
      val df = joined.select(col("i"), col("j"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"))
        .filter(col("edit_dist") <= 40)
      df.write.format("noop").mode("overwrite").save()
    })
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-tool main (Bench/Verify/Probe precedent): the measured answer to
  * the r13 verdict's skew question — on the 16× corpus, does AQE's
  * `OptimizeSkewedJoin` engage on q43's PLAIN twin at PRODUCTION
  * thresholds, and does the manual salt earn its keep?
  *
  * Three measurements over `args(0)` (default /tmp/sf16x), min-of-3
  * each, one JSON line:
  *  - `plain_production`: lineitem⨝supplier + group-by, AQE skew-join
  *    at stock thresholds (factor 5, 256 MiB), broadcast disabled so
  *    the join is a real SMJ (a broadcast join has no skewed shuffle
  *    to split — and at true estate scale supplier would not fit);
  *  - `plain_forced`: same plan with SkewSpec's test-scaled thresholds
  *    (factor 1.2, 8 KiB) — is the corpus even splittable, i.e. does
  *    the mechanism find partitions above factor×median here at all;
  *  - `salted_q43`: the shipped manual-salt operator.
  * Each records whether `skew=true` appears in the FINAL adaptive plan.
  */
object SkewAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf16x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.fasthash", "true")

    def plainTwin() = {
      val li = graft.model.Tables.lineitem(spark, sfDir).select(
        col("l_suppkey").as("suppkey"),
        graft.ops.Relational.discPriceOf(
          col("l_extendedprice"), col("l_discount")).as("rev"))
      val sup = graft.model.Tables.supplier(spark, sfDir)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      li.join(sup, Seq("suppkey"))
        .groupBy("s_nationkey")
        .agg(sum("rev").cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }

    /** (min-of-3 seconds, skew=true in the final adaptive plan) */
    def measure(mk: () => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      var skew = false
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = mk()
        df.write.format("noop").mode("overwrite").save()
        skew |= df.queryExecution.executedPlan.toString.contains("skew=true")
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, skew)
    }

    def withConfs(kvs: (String, String)*)(body: => (Double, Boolean))
        : (Double, Boolean) = {
      val saved = kvs.map { case (k, _) =>
        k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // warmup (scan + shuffle + codegen)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    val (tProd, sProd) = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(measure(plainTwin))
    val (tForced, sForced) = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")(
      measure(plainTwin))
    val (tSalt, sSalt) = measure(() =>
      graft.ops.Relational.q43.run(spark, sfDir))

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    println(s"""{"metric":"skew_audit","sf":"$sfDir",""" +
      s""""plain_production_sec":${fmt(tProd)},"plain_production_skew_split":$sProd,""" +
      s""""plain_forced_sec":${fmt(tForced)},"plain_forced_skew_split":$sForced,""" +
      s""""salted_q43_sec":${fmt(tSalt)},"salted_q43_skew_split":$sSalt}""")
  }
}

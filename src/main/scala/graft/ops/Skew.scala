package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins/aggregations.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on via
  * [[graft.GraftSession]]) handles most skew at runtime; explicit salting
  * is the tool for the cases AQE can't fix — aggregation hot keys, and
  * joins where one build-side key is so hot that a single task would
  * still own it after splitting.
  */
object Skew {

  /** Salted equi-join: the left (large, skewed) side gets a random-ish
    * but DETERMINISTIC salt derived from other columns (never `rand()` —
    * retried tasks must produce identical rows); the right side explodes
    * each row into all `saltBuckets` salts. Result equals a plain inner
    * join on `key`, but the shuffle spreads each hot key over
    * `saltBuckets` reducers. Right-side blowup is `saltBuckets`×, so use
    * for dimension-sized right sides with a hot probe key. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(saltSource), lit(saltBuckets)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for hot-key sums: group by
    * (key, salt) first so no single reducer owns a hot key, then combine.
    * Spark's own hash aggregate already does map-side partials; this adds
    * a reducer-side split for keys whose post-combine cardinality is
    * still skewed (e.g. 10⁹ rows of one key across 10⁵ map tasks). */
  def twoPhaseSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int, saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}

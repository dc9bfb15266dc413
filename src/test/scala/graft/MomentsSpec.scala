package graft

import org.apache.spark.sql.functions._

/** Pins q62 (exact higher-moment profiling): the integer pass equals a
  * direct recompute, and the finished statistics land where the
  * generating distributions put them (TPC-H money columns are
  * near-uniform: skew ≈ 0, excess kurtosis ≈ −1.2·10⁶ micro). */
class MomentsSpec extends SparkSpec {

  private lazy val rows = ops.Relational.q62.run(spark, sf).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("q62: power-sum pass equals a direct driver recompute") {
    assert(rows.keySet == Set("l_discount", "l_extendedprice",
      "l_quantity", "o_totalprice"))
    val xs = model.Tables.lineitem(spark, sf)
      .select(expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("x")).collect().map(_.getLong(0))
    val (n, s, mc, sd, _, _) = rows("l_quantity")
    assert(n == xs.length)
    assert(s == xs.sum)
    assert(mc == xs.sum / xs.length)
    // stddev from the same power sums, recomputed independently
    val nn = xs.length.toDouble
    val mean = xs.sum / nn
    val m2 = xs.map(x => x.toDouble * x).sum / nn - mean * mean
    assert(math.abs(sd - math.round(math.sqrt(m2) * 1e6)) <= 1,
      s"stddev $sd vs ${math.sqrt(m2) * 1e6}")
  }

  test("q62: uniform-column shape laws (skew ~ 0, kurtosis ~ -1.2)") {
    for (c <- Seq("l_extendedprice", "l_quantity", "o_totalprice")) {
      val (_, _, _, sd, skew, kurt) = rows(c)
      assert(sd > 0, s"$c degenerate")
      assert(math.abs(skew) < 100000L, s"$c skew_micro $skew")
      assert(kurt > -1350000L && kurt < -1000000L, s"$c kurt_micro $kurt")
    }
  }
}

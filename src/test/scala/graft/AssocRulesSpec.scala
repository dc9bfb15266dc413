package graft

import org.apache.spark.sql.functions._

/** Pins q61 (Apriori association rules): the item prune is LOSSLESS
  * (a brute-force pair count with NO item pruning finds exactly the
  * same frequent pairs), the rule arithmetic obeys the defining
  * inequalities, and both directions of every frequent pair are
  * emitted. */
class AssocRulesSpec extends SparkSpec {

  private lazy val rows = ops.Relational.q61.run(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))).toMap

  test("q61: Apriori item prune loses no frequent pair (brute force)") {
    val b = model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val brute = b.select(col("ok"), col("pk").as("p1"))
      .join(b.select(col("ok"), col("pk").as("p2")), "ok")
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").count().filter(col("count") >= 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val got = rows.keySet.filter { case (a, c) => a < c }
    assert(got == brute.keySet,
      s"pair sets differ: ${(got diff brute.keySet).take(3)} extra, " +
        s"${(brute.keySet diff got).take(3)} missing")
    for ((p, sup) <- brute) assert(rows(p)._1 == sup, s"$p support")
    assert(got.nonEmpty, "no frequent pairs — vacuous corpus")
  }

  test("q61: rule laws — symmetry, support bounds, conf/lift arithmetic") {
    val nBaskets = model.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    for (((a, c), (pSup, aSup, cSup, conf, lift)) <- rows) {
      assert(rows.contains((c, a)), s"missing reverse rule of ($a,$c)")
      assert(rows((c, a))._1 == pSup, "pair support asymmetric")
      assert(pSup <= math.min(aSup, cSup), s"($a,$c) sup bound")
      assert(conf == pSup * 1000000L / aSup, s"($a,$c) conf")
      assert(conf <= 1000000L)
      assert(lift == conf * nBaskets / cSup, s"($a,$c) lift")
    }
    // chance-beating co-occurrence exists somewhere on this corpus
    assert(rows.values.exists(_._5 > 1000000L), "no rule beats chance")
  }
}

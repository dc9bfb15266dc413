package graft

import org.apache.spark.sql.functions._

/** er01's linkage laws on the real corpus: recall/precision by
  * construction, and the blocking bound that makes it scale. */
class EntityResolutionSpec extends SparkSpec {

  private lazy val links = ops.EntityResolution.er01.run(spark, sf).collect()

  test("every non-heavy registry record links back to exactly its source") {
    val custkeys = model.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val expected = custkeys.filter(k => k % 3 == 0 && k % 15 != 0).sorted
    // precision: no wrong-pair survives the threshold
    assert(links.forall(r => r.getLong(0) - 10000000L == r.getLong(1)),
      links.filter(r => r.getLong(0) - 10000000L != r.getLong(1)).take(3).toSeq)
    // recall: every perturbed-but-linkable record is found
    assert(links.map(_.getLong(1)).sorted.toSeq == expected.toSeq)
    // heavy cohort (balance drift) falls below threshold by design
    assert(!links.exists(_.getLong(1) % 15 == 0))
  }

  test("scores are the two designed levels: 32 normal, none between 4 and 28") {
    val scores = links.map(_.getLong(2)).distinct.sorted.toSeq
    assert(scores == Seq(32L), scores)
  }

  test("blocking bound: candidate pairs = sum over blocks, far below all-pairs") {
    val cust = model.Tables.customer(spark, sf)
    val nA = cust.count()
    val b = ops.EntityResolution.registry(spark, sf)
    val nB = b.count()
    val candidates = b.join(cust,
      col("nat_b") === col("c_nationkey") &&
        col("seg_b") === col("c_mktsegment")).count()
    val blockSum = cust.groupBy("c_nationkey", "c_mktsegment").count()
      .withColumnRenamed("count", "na")
      .join(b.groupBy("nat_b", "seg_b").count().withColumnRenamed("count", "nb"),
        col("c_nationkey") === col("nat_b") &&
          col("c_mktsegment") === col("seg_b"))
      .agg(sum(col("na") * col("nb"))).head().getLong(0)
    assert(candidates == blockSum)
    // the scale property: blocking cuts the comparison space by ~#blocks
    assert(candidates * 20 < nA * nB,
      s"candidates=$candidates vs all-pairs=${nA * nB}")
  }

  test("threshold-aware production blocking is link-for-link identical to the validation tier") {
    // the er02 production pass adds exact cents to the block key; the
    // refinement is sound because 28 is unreachable without the +24
    // acctbal agreement (name gradient maxes at 12) — so the two
    // candidate generations must emit the IDENTICAL link set
    val validation = ops.EntityResolution.links(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val production = ops.EntityResolution.linksProd(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(validation == production,
      s"only-validation=${(validation -- production).take(5)} " +
        s"only-production=${(production -- validation).take(5)}")
    assert(production.nonEmpty)
  }

  test("er03: blocking diagnostics match the closed-form cohort arithmetic") {
    import org.apache.spark.sql.functions._
    val rows = ops.EntityResolution.er03.run(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set("nation_segment", "nation_segment_cents"))
    val (cand1, _, comp1, lcomp1) = rows("nation_segment")
    val (cand2, _, comp2, lcomp2) = rows("nation_segment_cents")
    // blocked fields are unperturbed -> the wide scheme never loses a
    // true pair; the cents scheme loses exactly the drifted heavy cohort
    assert(comp1 == 1000000L)
    val keys = model.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 3 === 0)
      .select("c_custkey").collect().map(_.getLong(0))
    val nb = keys.length.toLong
    val heavy = keys.count(_ % 15 == 0).toLong
    assert(comp2 == (nb - heavy) * 1000000L / nb, s"nb=$nb heavy=$heavy")
    assert(heavy > 0, "no heavy cohort - the completeness trade is vacuous")
    // the refinement's contract: no LINKABLE pair is ever lost
    assert(lcomp1 == 1000000L && lcomp2 == 1000000L)
    // and it genuinely pays (the margin grows with block size — 2.7x
    // at sf0.001, 16x at sf0.01, ~quadratically beyond)
    assert(cand2 < cand1, s"cents blocking: $cand2 vs $cand1")
    info(s"candidates: wide $cand1, cents $cand2")
  }

  test("er04: bands partition the scored pairs; purity laws hold per band") {
    import org.apache.spark.sql.functions.col
    val bands = ops.EntityResolution.er04.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val scoredN = ops.EntityResolution.scoredPairs(spark, sf).count()
    assert(bands.values.map(_._1).sum == scoredN,
      "bands do not partition the scored pairs")
    // auto-link is exactly pure on this corpus (threshold unreachable
    // without the balance agreement, which only the true master has)
    val auto = bands("auto_link")
    assert(auto._3 == auto._1 && auto._2 == auto._3,
      s"auto_link band impure: $auto")
    // review captures exactly the drifted heavy cohort's true pairs —
    // derived from the table, not hardcoded
    val drifted = model.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 15 === 0).count()
    val review = bands("review")
    assert(review._3 == drifted,
      s"review band holds ${review._3} truths, drifted cohort is $drifted")
    assert(review._5 >= 8 && review._6 < 28, s"review scores out of band: $review")
    // non-match holds zero truths (no master's evidence decays that far)
    assert(bands("non_match")._3 == 0L)
  }

  test("er05: multi-pass SNM links ⊆ er01, high recall, diagnostics lawful") {
    val snm = ops.EntityResolution.er05.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val equi = ops.EntityResolution.links(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision: the 28 threshold is unreachable for wrong pairs, so
    // any pair SNM scores into a link must be an er01 link too
    assert(snm.keySet.subsetOf(equi), "SNM produced a non-er01 link")
    // recall: the multi-pass union must recover ≥95% of the equi-block
    // links (the cents pass is name-independent; only same-cent rank
    // collisions beyond the window can cost a link)
    assert(snm.size * 100 >= equi.size * 95,
      s"multi-pass recall ${snm.size}/${equi.size}")
    for (((b, a), (score, gap, passes)) <- snm) {
      assert(score >= 28 && a == b - 10000000L, s"($b,$a) not a true link")
      assert(gap >= 1 && gap < ops.EntityResolution.SnWindow, s"gap $gap")
      assert(passes >= 1 && passes <= 3, s"n_passes $passes")
    }
    // the pass set is not redundant on this corpus: some link is seen
    // by fewer than all three passes (single-key SNM would miss links)
    assert(snm.values.exists(_._3 < 3), "all links found by all passes")
  }
}

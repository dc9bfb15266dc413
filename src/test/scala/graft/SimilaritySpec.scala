package graft

/** Quality laws for the approximate ANN tiers against the exact s01
  * baseline. Approximation recall is a STATISTICAL property of the
  * codebook/corpus (cf. the simhash recall spec) — asserted as a
  * quantified floor with the per-query values logged, not as
  * containment. */
class SimilaritySpec extends SparkSpec {

  private def topk(q: Q): Map[Long, Set[Long]] =
    q.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("PQ top-5 recall vs exact brute force is quantified") {
    val exact = topk(ops.Similarity.s01)
    val pq = topk(ops.Similarity.s04)
    assert(exact.keySet == pq.keySet, "same query set")
    val recalls = exact.map { case (q, ex) =>
      q -> pq(q).intersect(ex).size.toDouble / ex.size
    }
    recalls.toSeq.sortBy(_._1).foreach { case (q, r) =>
      info(f"query $q: recall $r%.1f")
    }
    val mean = recalls.values.sum / recalls.size
    info(f"mean recall = $mean%.2f (R=50 shortlist, 16-entry codebooks)")
    // measured 0.72 on this deterministic corpus; 0.6 floors the build
    // against a codebook/encoding regression without pinning hash luck
    assert(mean >= 0.6, f"PQ mean recall $mean%.2f < 0.6")
  }

  test("IVF top-5 recall vs exact brute force is quantified") {
    val exact = topk(ops.Similarity.s01)
    val ivf = topk(ops.Similarity.s03)
    val recalls = exact.map { case (q, ex) =>
      q -> ivf.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.values.sum / recalls.size
    info(f"mean recall = $mean%.2f (P=4 probes of C=16 lists)")
    assert(mean >= 0.5, f"IVF mean recall $mean%.2f < 0.5")
  }
}

package graft

class DedupSpec extends SparkSpec {

  test("minhash LSH candidates contain every high-Jaccard pair") {
    val exact = ops.Dedup.d02.run(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = ops.Dedup.d03.run(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(exact.subsetOf(cand),
      s"missing: ${exact.diff(cand).take(5)}")
  }

  test("exact dedup keeps one keeper per digest with n_copies = 2") {
    val rows = ops.Dedup.d01.run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 2L))
    val keepers = rows.map(_.getLong(1))
    assert(keepers.distinct.length == keepers.length)
  }

  test("simhash near-dup pairs include the Jaccard near-dups") {
    val exact = ops.Dedup.d02.run(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = ops.Dedup.d05.run(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(sim))
  }

  test("d07 bucketed simhash returns exactly d05's all-pairs result") {
    // pigeonhole guarantee: Hamming ≤ 8 over 9 blocks ⇒ ≥1 block equal,
    // so candidates ⊇ true pairs; the exact verifier then makes the two
    // queries set-identical, not merely overlapping.
    val allPairs = ops.Dedup.d05.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = ops.Dedup.d07.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(allPairs.nonEmpty, "corpus should contain simhash near-dups")
    assert(bucketed == allPairs,
      s"missing=${allPairs.diff(bucketed).take(5)} extra=${bucketed.diff(allPairs).take(5)}")
  }

  test("d09 production simhash equals the all-pairs Hamming<=3 reference") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val h = model.Tables.documents(spark, sf)
      .select(col("doc_id"), expr("simhash64(split(text, ' '))").as("h"))
    val reference = h.as("a")
      .join(h.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.h ^ b.h)").cast("long").as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = ops.Dedup.d09.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reference.nonEmpty, "corpus should contain Hamming<=3 pairs")
    assert(bucketed == reference,
      s"missing=${reference.diff(bucketed).take(5)} extra=${bucketed.diff(reference).take(5)}")
  }

  test("t06 winnow candidates contain the word-level high-Jaccard pairs") {
    val exact = ops.Dedup.d02.run(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnowed = ops.TextAnalysis.t06.run(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(winnowed), s"missing: ${exact.diff(winnowed).take(5)}")
  }
}

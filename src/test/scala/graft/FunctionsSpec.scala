package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, SimHash64}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim: parallel, orthogonal, opposite, zero vectors") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Array(1f, 0f), Array(2f, 0f)),   // parallel → 1
      (2L, Array(1f, 0f), Array(0f, 3f)),   // orthogonal → 0
      (3L, Array(1f, 0f), Array(-1f, 0f)),  // opposite → -1
      (4L, Array(0f, 0f), Array(1f, 1f)))   // zero norm → 0 (guard)
      .toDF("id", "a", "b")
    val out = df.selectExpr("id", "cosine_sim(a, b) AS c")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(out(3L) == -1.0)
    assert(out(4L) == 0.0)
  }

  test("cosine_sim matches built-in aggregate/zip_with formulation") {
    GraftFunctions.register(spark)
    val e = model.Tables.embeddings(spark, sf).limit(100)
    val both = e.selectExpr(
      "cosine_sim(embedding, embedding) AS custom",
      """aggregate(zip_with(embedding, embedding,
        |  (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)
        |/ (sqrt(aggregate(zip_with(embedding, embedding,
        |  (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)) *
        |  sqrt(aggregate(zip_with(embedding, embedding,
        |  (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin + " AS builtin")
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine_sim null propagates") {
    GraftFunctions.register(spark)
    val df = Seq((Option(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.selectExpr("cosine_sim(a, b)").head().isNullAt(0))
  }

  test("dot_product null semantics match the built-in fold exactly") {
    // the RewriteDotProducts optimizer rule swaps the built-in idiom for
    // DotProduct on ANY float arrays (incl. containsNull=true, what
    // parquet reads) — sound only if null handling is identical: NULL on
    // length mismatch (zip_with pads with null) and on any null element.
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (2L, Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(3f), Some(4f))),
      (3L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f))))
      .toDF("id", "a", "b")
    val rows = df.selectExpr("id", "dot_product(a, b) AS custom",
      """aggregate(zip_with(a, b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
        |CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS builtin""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"id=${r.getLong(0)}: $r")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(rows.count(_.isNullAt(1)) == 2)
  }

  test("simhash64: pinned values, identity, and locality") {
    // pinned: the fingerprint is a stable contract (rows-only driver
    // checks re-run the query, so cross-run stability matters)
    val h1 = SimHash64.ofTokens(Seq("spark", "query", "engine"))
    assert(h1 == SimHash64.ofTokens(Seq("spark", "query", "engine")))
    // permutation of a token multiset → identical simhash (bag semantics)
    assert(h1 == SimHash64.ofTokens(Seq("engine", "spark", "query")))
    // near-identical docs → small hamming; disjoint docs → larger
    val doc = (1 to 60).map(i => s"tok$i")
    val near = SimHash64.ofTokens(doc.updated(3, "changed"))
    val far = SimHash64.ofTokens((1 to 60).map(i => s"other$i"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(SimHash64.ofTokens(doc), near) < ham(SimHash64.ofTokens(doc), far))
  }

  test("simhash64 expression agrees with direct computation") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "spark query engine")).toDF("id", "text")
    val viaSql = df.selectExpr("simhash64(split(text, ' '))").head().getLong(0)
    assert(viaSql == SimHash64.ofTokens(Seq("spark", "query", "engine")))
  }
}

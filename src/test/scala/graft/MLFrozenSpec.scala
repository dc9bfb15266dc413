package graft

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.feature.{HashingTF, IDFModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.MLClassify

/** Pins the ml04 frozen-serving path (r05 verdict #3) against the live
  * MLlib model from three directions:
  *
  *  1. staleness — a fresh deterministic refit on the fixture's training
  *     corpus must reproduce the committed weight tables bit-for-bit; if
  *     the pipeline definition drifts (NumFeatures, regParam, teacher
  *     lexicon), this fails loudly with "regenerate fixtures/ml" instead
  *     of ml04 silently serving a stale model;
  *  2. coverage — every serving-time token must appear in the committed
  *     term index, or the tf join silently drops features the live
  *     HashingTF would count;
  *  3. fidelity — the integer-quantised relational argmax must equal the
  *     live model's float argmax doc-for-doc.
  */
class MLFrozenSpec extends SparkSpec {

  private val trainDir = "/root/testdata/sf0.01"

  private lazy val refit = MLClassify.fitModel(Tables.documents(spark, trainDir))

  test("committed fixture weights equal a fresh deterministic refit (stale guard)") {
    val (model, labels) = refit
    val lr = model.stages.collectFirst { case m: LogisticRegressionModel => m }.get
    val idfModel = model.stages.collectFirst { case m: IDFModel => m }.get
    val hashing = model.stages.collectFirst { case h: HashingTF => h }.get

    val coef = spark.read.parquet(s"${MLClassify.mlFixtureDir}/coef.parquet")
      .collect().map(r => ((r.getInt(0), r.getInt(2)), (r.getString(1), r.getDouble(3)))).toMap
    assert(coef.size == labels.length * MLClassify.NumFeatures)
    for (c <- labels.indices; j <- 0 until MLClassify.NumFeatures) {
      val (label, w) = coef((c, j))
      assert(label == labels(c))
      assert(w == lr.coefficientMatrix(c, j),
        s"coef ($c,$j) drifted — regenerate fixtures/ml (rm -r && sbt runMain graft.FixtureGen)")
    }
    val icept = spark.read.parquet(s"${MLClassify.mlFixtureDir}/intercept.parquet")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    labels.indices.foreach { c =>
      assert(icept(c) == lr.interceptVector(c), s"intercept $c drifted — regenerate fixtures/ml")
    }
    val idf = spark.read.parquet(s"${MLClassify.mlFixtureDir}/idf.parquet")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until MLClassify.NumFeatures).foreach { j =>
      assert(idf(j) == idfModel.idf(j), s"idf $j drifted — regenerate fixtures/ml")
    }
    // term index buckets must be the model's own hash function
    spark.read.parquet(s"${MLClassify.mlFixtureDir}/term_index.parquet")
      .collect().foreach { r =>
        assert(r.getInt(1) == hashing.indexOf(r.getString(0)))
      }
  }

  test("term index covers every serving-time token at all tested scale factors") {
    val indexed = spark.read.parquet(s"${MLClassify.mlFixtureDir}/term_index.parquet")
      .select("term")
    Seq(sf, trainDir, "/root/testdata/sf0.1").foreach { dir =>
      val missing = Tables.documents(spark, dir)
        .select(explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
          .as("term"))
        .distinct()
        .join(indexed, Seq("term"), "left_anti")
        .collect().map(_.getString(0))
      assert(missing.isEmpty, s"$dir has tokens outside the committed term index: ${missing.toSeq.sorted}")
    }
  }

  test("ml04's tokenizer-parity precondition holds on every tested corpus") {
    // ml04 tokenizes relationally (split \s+ with empty-token filter,
    // locale-invariant lower); the live MLlib Tokenizer splits on \s
    // (KEEPING interior empty tokens, which HashingTF hashes as real
    // features) and lowercases in the default locale. The two agree
    // exactly iff the corpus is single-space-separated ASCII with no
    // leading/trailing whitespace — which is guaranteed here because
    // normalisation (t20) is pipeline stage zero. This guard makes the
    // precondition LOUD: a future corpus with doubled spaces or
    // non-ASCII case pairs fails here, instead of the frozen argmax
    // silently drifting from the live model's.
    Seq(sf, trainDir, "/root/testdata/sf0.1").foreach { dir =>
      val dirty = Tables.documents(spark, dir).filter(
        col("text").rlike("\\s\\s|^\\s|\\s$") ||
          col("text").rlike("[^\\x20-\\x7e]"))
        .count()
      assert(dirty == 0L,
        s"$dir: $dirty docs violate ml04's whitespace/ASCII precondition — " +
          "normalise (t20) before serving or align the tokenizers")
    }
  }

  test("quantised relational argmax equals the live model's argmax, doc for doc") {
    val (model, labels) = refit
    Seq(sf, trainDir).foreach { dir =>
      val docs = Tables.documents(spark, dir)
      // bare serving: the pipeline's StringIndexer stage needs label_str
      // to exist, but its output is unused by the LR transform
      val live = model.transform(
        docs.select(col("doc_id"), col("text"), lit(labels(0)).as("label_str")))
        .select(col("doc_id"),
          element_at(array(labels.toIndexedSeq.map(lit): _*),
            col("prediction").cast("int") + 1).as("live_category"))
      val frozen = MLClassify.ml04.run(spark, dir)
      val diff = frozen.join(live, "doc_id")
        .filter(col("category") =!= col("live_category"))
        .count()
      assert(diff == 0L, s"$dir: $diff docs disagree between frozen and live serving")
      assert(frozen.count() == docs.count())
    }
  }

  test("intercept-only path: a doc with no indexed tokens still gets the argmax-intercept class") {
    // the winning label under zero features is the max quantised intercept
    val icept = spark.read.parquet(s"${MLClassify.mlFixtureDir}/intercept.parquet")
      .collect().map(r => (r.getString(1), math.round(r.getDouble(2) * 1e9)))
    val expected = icept.minBy { case (l, b) => (-b, l) }._1
    // run the ml04 dataflow over a 1-doc frame whose token joins nothing:
    // simplest route is asserting the scores frame logic via the fixture
    // directly — an unindexable token string
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ml04-icept").toString
    Seq((1L, "zzzz_not_in_vocab qqqq_not_in_vocab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = MLClassify.ml04.run(spark, tmp).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == expected)
    assert(out(0).getLong(2) == icept.map(_._2).max)
  }

  test("ml16: hash space loads near-uniformly and signed collisions cancel") {
    val rows = MLClassify.ml16.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vocab = rows.map(_._2).sum
    assert(vocab > MLClassify.HashDims,
      s"feature space $vocab <= D — the hashing-trick regime is vacuous")
    // load law: no dimension hoards the vocabulary (md5 behaves
    // uniformly; a skew here means the salt or modulus broke)
    val meanLoad = vocab.toDouble / MLClassify.HashDims
    assert(rows.map(_._2).max <= math.ceil(meanLoad * 4),
      s"max load ${rows.map(_._2).max} vs mean $meanLoad")
    // collisions are the normal case, and the ±1 sign genuinely cancels
    // on colliding dims (|signed| < total is impossible without
    // opposite-sign tokens sharing the dim)
    val colliding = rows.filter(_._2 >= 2)
    assert(colliding.length * 2 > rows.length, "collisions are rare — D too big")
    val cancelling = colliding.count(r => math.abs(r._4) < r._3)
    assert(cancelling * 2 > colliding.length,
      s"cancellation fired on only $cancelling of ${colliding.length} dims")
    // single-token dims carry their count through exactly (no smearing)
    rows.filter(_._2 == 1).foreach { case (dim, _, tot, sgn) =>
      assert(math.abs(sgn) == tot, s"dim $dim: lone token distorted")
    }
  }

  test("ml17: McNemar cells reconcile with ml15's marginals; statistic lawful") {
    val Array(mc) = ops.MLClassify.ml17.run(spark, sf).collect()
    val (n11, n10, n01, n00) =
      (mc.getLong(0), mc.getLong(1), mc.getLong(2), mc.getLong(3))
    val (chi2, sig) = (mc.getLong(4), mc.getBoolean(5))
    val Array(m15) = ops.MLClassify.ml15.run(spark, sf).collect()
    val nDocs = m15.getLong(0)
    // the 2×2 table partitions the eval corpus
    assert(n11 + n10 + n01 + n00 == nDocs, "cells don't partition")
    // marginal reconciliation: each model's accuracy ppm from the
    // cells must equal ml15's independently computed accuracy columns
    assert((n11 + n10) * 1000000L / nDocs == m15.getLong(3),
      "full-model marginal mismatch")
    assert((n11 + n01) * 1000000L / nDocs == m15.getLong(4),
      "quant-model marginal mismatch")
    // continuity-corrected statistic recompute
    val d = n10 + n01
    val expect =
      if (d == 0) 0L
      else (math.abs(n10 - n01) - 1) * (math.abs(n10 - n01) - 1) * 1000000L / d
    assert(chi2 == expect, s"chi2 $chi2 vs $expect")
    assert(sig == (d != 0 && expect > 3841459L))
    // the test is non-vacuous: some disagreement exists on this corpus
    assert(d > 0, "no discordant pairs — vacuous")
  }
}

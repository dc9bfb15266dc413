package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class TypedAndMLSpec extends SparkSpec {
  import spark.implicits._

  test("TopKByScore equals window ranking on literal data") {
    val topk = new functions.TopKByScore(2)
    val data = Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0),
      (2L, 20L, 1.0))
    val out = data.toDF("g", "k", "s").as[(Long, Long, Double)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("topk"))
      .collect().toMap
    // score desc, key asc tiebreak: 11 before 12 (both 9.0)
    assert(out(1L) == Seq((9.0, 11L), (9.0, 12L)))
    assert(out(2L) == Seq((1.0, 20L)))
  }

  test("mllib classifier: schema contract, label domain, confidence bounds") {
    val out = ops.MLClassify.classifyWithModel(model.Tables.documents(spark, sf))
    assert(out.columns.toSet ==
      Set("doc_id", "category", "confidence", "teacher_category"))
    val rows = out.collect()
    val domain = ops.NewsPipeline.lexicon.map(_._1).toSet
    rows.foreach { r =>
      assert(domain.contains(r.getString(1)))
      val c = r.getDouble(2)
      assert(c > 0.0 && c <= 1.0)
    }
    // distillation should mostly agree with the teacher on training data
    val agree = rows.count(r => r.getString(1) == r.getString(3)).toDouble /
      rows.length
    assert(agree > 0.9, s"agreement $agree")
  }

  test("ml06: centroid classifier scores are cosine-law-bounded and mostly agree with the teacher") {
    val rows = ops.MLClassify.ml06.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val domain = ops.NewsPipeline.lexicon.map(_._1).toSet
    rows.foreach { r =>
      assert(domain.contains(r.getString(1)), "predicted label in domain")
      assert(domain.contains(r.getString(3)), "teacher label in domain")
      // score = dot/√s2 = cos·‖doc tf‖ > 0: every labelled doc shares at
      // least its own keywords with its class centroid
      assert(r.getDouble(2) > 0.0, s"doc ${r.getLong(0)} score not positive")
    }
    // one prediction per labelled doc (argmax is total)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // the closed-form fit is a weaker model than LR but must still beat
    // chance by a wide margin on its own training corpus
    val agree = rows.count(r => r.getString(1) == r.getString(3)).toDouble /
      rows.length
    assert(agree > 0.5, s"teacher agreement $agree")
  }

  test("ml09: learning curve points share one eval set; training sets nest") {
    val rows = ops.MLClassify.ml09.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), "three curve points")
    // the eval fold is FIXED: every point scores the same held-out docs
    assert(rows.map(_._3).distinct.length == 1, "eval set drifted across k")
    // training prefixes nest and strictly grow
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 > p._2, "training prefix did not grow")
    }
    // fold arithmetic: train(3) + eval = all labelled docs
    val labelled = ops.NewsPipeline.classify(
      model.Tables.documents(spark, sf).select("doc_id", "text"))
      .filter(org.apache.spark.sql.functions.col("category") =!= "unknown")
      .count()
    assert(rows.last._2 + rows.head._3 == labelled,
      "folds 0-2 plus the eval fold must partition the labelled corpus")
    // accuracy consistency: acc_ppm is the exact integer ratio
    rows.foreach { case (k, _, nEval, nCorrect, accPpm) =>
      assert(accPpm == nCorrect * 1000000L / nEval, s"point $k ratio")
      assert(nCorrect <= nEval)
    }
    info(s"curve (n_train -> acc_ppm): " +
      rows.map(r => s"${r._2} -> ${r._5}").mkString(", "))
    // a third of the data must already beat chance (7 classes)
    assert(rows.head._5 > 1000000L / 7, "first point no better than chance")
  }

  test("model cache: regenerating the corpus under the same path retrains") {
    // The cache is keyed by corpusFingerprint(dir), not the dir string:
    // rewriting documents.parquet in place must produce a NEW key (→ a
    // second fit), never silently serve the model of the old data.
    val tmp = java.nio.file.Files.createTempDirectory("graft_ml_cache").toFile
    try {
      val dir = tmp.getAbsolutePath
      model.Tables.documents(spark, sf).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val fp1 = ops.MLClassify.corpusFingerprint(dir)
      ops.MLClassify.classifyWithModel(
        model.Tables.documents(spark, dir), cacheKey = fp1).head()
      assert(ops.MLClassify.cachedKeys.contains(fp1))
      // regenerate in place with different content (size changes too)
      model.Tables.documents(spark, sf).limit(400).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val fp2 = ops.MLClassify.corpusFingerprint(dir)
      assert(fp2 != fp1, "fingerprint must change when the parquet is rewritten")
      val out = ops.MLClassify.classifyWithModel(
        model.Tables.documents(spark, dir), cacheKey = fp2)
      assert(out.count() <= 400)
      assert(ops.MLClassify.cachedKeys.contains(fp2), "second fit not memoised")
      assert(!ops.MLClassify.cachedKeys.contains(fp1),
        "stale model for the same dir must be evicted, not accumulated")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }

  test("model persistence: reloaded model serves bit-identical predictions") {
    // the cache is per-JVM; a deployment restart serves from disk — the
    // round-trip must preserve predictions AND probabilities exactly
    // (labels travel inside the persisted StringIndexerModel stage)
    val docs = model.Tables.documents(spark, sf)
    val (m, labels) = ops.MLClassify.fitModel(docs)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ml_model").toFile
    try {
      val path = new java.io.File(tmp, "m").getAbsolutePath
      ops.MLClassify.saveModel(m, path)
      val (m2, labels2) = ops.MLClassify.loadModel(path)
      assert(labels2.sameElements(labels), "label mapping must survive the round-trip")
      val live = ops.MLClassify.serveModel(m, labels, docs)
        .orderBy("doc_id").collect()
      val reloaded = ops.MLClassify.serveModel(m2, labels2, docs)
        .orderBy("doc_id").collect()
      assert(live.length == reloaded.length && live.nonEmpty)
      live.zip(reloaded).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0))
        assert(a.getString(1) == b.getString(1), s"doc ${a.getLong(0)}: category")
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(b.getDouble(2)),
          s"doc ${a.getLong(0)}: confidence must be bit-identical")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }

  test("multimodal decode: real codecs per modality through mapPartitions") {
    val media = Multimodal.realMediaFrame(model.Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      if (f.media_type == "image") {
        // BMP decode: f0/f1 = dimensions, f2/f3 = channel means
        assert(f.f0 == 16.0 && f.f1 == 12.0)
        assert(f.f2 >= 0 && f.f2 <= 255 && f.f3 >= 0 && f.f3 <= 255)
      } else {
        // μ-law decode: f0/f1 = rate/samples, f2/f3 = linear peak/RMS
        assert(f.f0 == 8000.0 && f.f1 == 800.0)
        assert(f.f2 > 0 && f.f3 > 0 && f.f3 < f.f2)
      }
    }
  }

  test("ty02: typed mapGroups equals the untyped agg; plan carries no partial aggregate") {
    import org.apache.spark.sql.functions._
    val typed = ops.TypedOps.ty02.run(spark, sf)
    // untyped twin: broadcast-joined, map-side-combined aggregation
    val cents = expr(
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    val untyped = model.Tables.orders(spark, sf)
      .join(model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(cents).cast("long").as("total_cents"),
        max(cents).cast("long").as("max_order_cents"))
      .orderBy("c_custkey")
    val a = typed.collect().map(_.toSeq).toSeq
    val b = untyped.collect().map(_.toSeq).toSeq
    assert(a == b, "typed and untyped results diverge")
    // the honest cost, pinned: mapGroups cannot partial-aggregate —
    // every order row crosses the shuffle; the untyped twin combines
    // map-side (partial HashAggregate before its exchange)
    val typedPlan = typed.queryExecution.executedPlan.toString
    assert(typedPlan.contains("MapGroups"), typedPlan.take(600))
    assert(!typedPlan.contains("partial_"), "typed plan grew a combiner?")
    val untypedPlan = untyped.queryExecution.executedPlan.toString
    assert(untypedPlan.contains("partial_"),
      "untyped twin lost its map-side combine")
  }

  test("ml19: kNN vote equals a sequential reimplementation; plan pushes the top-k") {
    import graft.ops.MLClassify
    val got = MLClassify.ml19.run(spark, sf)
    val plan = got.queryExecution.executedPlan.toString
    // the rank<=k filter must reach the map side (WindowGroupLimit),
    // and the probe side must ride a broadcast, never a shuffled cartesian
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    val rows = got.collect()
    assert(rows.length == MLClassify.KnnProbes)

    // sequential reimplementation: brute-force kNN + majority vote on
    // the collected sf0.001 table (500 x 64 — driver-trivial)
    val all = graft.model.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val (probes, train) = all.partition(_._1 < MLClassify.KnnProbes)
    val expected = probes.map { case (qid, qe, ql) =>
      val top = train
        .map { case (nid, ne, nl) => (nid, nl, cos(qe, ne)) }
        .sortBy { case (nid, _, c) => (-c, nid) }
        .take(MLClassify.KnnK)
      val (predLabel, votes) = top.groupBy(_._2).view
        .mapValues(_.length).toSeq
        .sortBy { case (l, v) => (-v, l) }.head
      (qid, ql, predLabel, votes.toLong, ql == predLabel)
    }.sortBy(_._1)
    val gotT = rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(gotT.toSeq == expected.toSeq,
      s"vote divergence: got=${gotT.take(3).toSeq} exp=${expected.take(3).toSeq}")
    // non-degenerate mechanism (NOT accuracy: this corpus's labels are
    // geometry-independent by construction — 1-NN sits at 10-class
    // chance — so the op pins the VOTE, and accuracy claims would be
    // fiction): votes stay in [1, k], the classifier is non-constant,
    // and at least one probe had a contested vote
    assert(gotT.forall(r => r._4 >= 1 && r._4 <= MLClassify.KnnK),
      "vote count outside [1, k]")
    assert(gotT.map(_._3).distinct.length > 1, "constant classifier")
    assert(gotT.exists(_._4 < MLClassify.KnnK),
      "every vote unanimous — fixture too clustered to exercise ties")
  }
}

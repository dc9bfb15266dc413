package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins ml02 (classifier evaluation) against a driver-side recompute of
  * the confusion counts, and q37 (OHLC resampling) against an
  * independent window-function formulation of open/close — two
  * different dataflows must agree on every bar, including `ts` ties
  * broken by event_id. */
class MetricsSpec extends SparkSpec {

  test("ml02: metrics equal a driver-side recompute from t03 predictions") {
    val preds = ops.TextAnalysis.t03.run(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))) // (gold, predicted)
    val classes = ops.TextAnalysis.langLexicon.map(_._1) :+ "und"
    val expected = classes.map { c =>
      val tp = preds.count { case (g, p) => g == c && p == c }.toLong
      val fp = preds.count { case (g, p) => p == c && g != c }.toLong
      val fn = preds.count { case (g, p) => g == c && p != c }.toLong
      c -> ((tp, fp, fn))
    }.toMap
    val rows = ops.MLClassify.ml02.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == classes.toSet + "macro")
    rows.filter(_.getString(0) != "macro").foreach { r =>
      val (tp, fp, fn) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((tp, fp, fn)),
        s"confusion counts for ${r.getString(0)}")
      val prec = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
      val rec = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
      val f1 = if (2 * tp + fp + fn == 0) 0.0
        else 2.0 * tp / (2.0 * tp + fp + fn)
      assert(math.abs(r.getDouble(4) - prec) < 1e-12)
      assert(math.abs(r.getDouble(5) - rec) < 1e-12)
      assert(math.abs(r.getDouble(6) - f1) < 1e-12)
    }
    val macroRow = rows.find(_.getString(0) == "macro").get
    val perClass = rows.filter(_.getString(0) != "macro")
    assert(macroRow.getLong(1) == perClass.map(_.getLong(1)).sum)
    assert(math.abs(macroRow.getDouble(6) -
      perClass.map(_.getDouble(6)).sum / classes.size) < 1e-12)
  }

  test("q51: TWAP equals a sequential per-bucket recompute") {
    // bucket_h surfaces as Timestamp or LocalDateTime depending on the
    // session's NTZ handling — key on epoch micros either way
    def tsKey(v: Any): Long = v match {
      case t: java.sql.Timestamp =>
        val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000
      case d: java.time.LocalDateTime =>
        val i = d.toInstant(java.time.ZoneOffset.UTC)
        i.getEpochSecond * 1000000L + i.getNano / 1000
    }
    val rows = ops.Relational.q51.run(spark, sf).collect()
    val ev0 = model.Tables.events(spark, sf)
    val raw = ev0.select(col("event_type"),
        date_trunc("hour", ops.EventStreams.eventTs(ev0)).as("bucket_h"),
        ops.EventStreams.eventMicros(ev0).as("m"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), tsKey(r.get(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = raw.groupBy(t => (t._1, t._2)).map { case ((typ, bh), es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      val bucketEnd = sorted.head._3 / 3600000000L * 3600000000L + 3600000000L
      var wsum = BigInt(0); var dur = 0L
      sorted.zipWithIndex.foreach { case ((_, _, m, _, cents), i) =>
        val next = if (i + 1 < sorted.length) sorted(i + 1)._3 else bucketEnd
        wsum += BigInt(cents) * (next - m); dur += next - m
      }
      (typ, bh) -> ((sorted.length.toLong, dur, (wsum / dur).toLong))
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getString(0), tsKey(r.get(1)))
      val (n, dur, twap) = expected(key)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((n, dur, twap)),
        s"twap bar $key")
    }
    // anti-vacuity: at least one bucket where TWAP differs from the plain
    // mean (the burst-overweighting the operator exists to correct)
    val plain = raw.groupBy(t => (t._1, t._2)).map { case (k, es) =>
      k -> es.map(e => BigInt(e._5)).sum / es.length
    }
    assert(rows.exists(r =>
      plain((r.getString(0), tsKey(r.get(1)))) != BigInt(r.getLong(4))))
  }

  test("ml10: chi2 selection equals an exact BigInt recompute per class") {
    val got = ops.MLClassify.ml10.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    // rebuild the contingency tables on the driver with BigInt arithmetic
    val docs = model.Tables.documents(spark, sf).select("doc_id", "text")
    val lab = ops.NewsPipeline.classify(docs)
      .filter(col("category") =!= "unknown")
      .select("doc_id", "category").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val text = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pres = lab.keys.toSeq.flatMap(id =>
      text(id).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (id, t)))
    val n = lab.size.toLong
    val df = pres.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val classes = lab.values.toSet
    val chi = for {
      c <- classes.toSeq
      nc = lab.count(_._2 == c).toLong
      (t, dft) <- df.toSeq if dft < n
      a = pres.count { case (id, tt) => tt == t && lab(id) == c }.toLong
      if a >= 1
    } yield {
      val b = dft - a; val c2 = nc - a; val d2 = n - nc - b
      val diff = BigInt(a * d2 - b * c2)
      val num = diff * diff * n * 1000000
      val den = BigInt(dft) * (n - dft) * nc * (n - nc)
      (c, t, a, (num / den).toLong)
    }
    val expectedTop = chi.groupBy(_._1).flatMap { case (c, ts) =>
      ts.sortBy(x => (-x._4, x._2)).take(10).zipWithIndex
        .map { case ((cc, t, a, x2), i) => (cc, t, a, x2, i + 1L) }
    }.toSet
    assert(got.toSet == expectedTop,
      s"diff: ${(got.toSet diff expectedTop).take(3)}")
    // law: chi2 is bounded by N (in micros) and the winner is genuinely
    // class-discriminative (its in-class share beats its corpus share)
    assert(got.forall(_._4 <= n * 1000000L))
  }

  test("q37: min_by/max_by bars equal a window row_number formulation") {
    val ohlc = ops.Relational.q37.run(spark, sf)
    val ev0 = model.Tables.events(spark, sf)
    val ev = ev0
      .select(date_trunc("hour", ops.EventStreams.eventTs(ev0)).as("bucket_h"),
        col("event_type"), ops.EventStreams.eventMicros(ev0).as("micros"),
        col("event_id"), col("value"))
    val asc = Window.partitionBy("bucket_h", "event_type")
      .orderBy(col("micros"), col("event_id"))
    val desc = Window.partitionBy("bucket_h", "event_type")
      .orderBy(col("micros").desc, col("event_id").desc)
    val viaWindow = ev
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("bucket_h", "event_type")
      .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).cast("long").as("volume"))
    assert(ohlc.count() > 0)
    assert(ohlc.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(ohlc).isEmpty)
  }

  test("q37: open/close ties on ts are broken by event_id") {
    // two events in the same hour with IDENTICAL ts — the padded-key
    // argmin must pick event_id order, not value or arrival order
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val rows = Seq((10L, ts0, "click", 5.0), (11L, ts0, "click", 2.0),
      (12L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00"), "click", 9.0))
      .toDF("event_id", "ts", "event_type", "value")
    val key = expr(
      "CAST(unix_micros(ts) AS DECIMAL(38,0)) * 1000000000000000000 + event_id")
    val bar = rows.groupBy(date_trunc("hour", col("ts")).as("bucket_h"))
      .agg(min_by(col("value"), key).as("open"),
        max_by(col("value"), key).as("close")).collect().head
    assert(bar.getDouble(1) == 5.0, "open = value of lowest event_id at tied ts")
    assert(bar.getDouble(2) == 9.0)
  }

  test("ml03: ROC laws hold and AUC equals a driver-side recompute") {
    val rows = ops.MLClassify.ml03.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // descending score; tp/fp cumulative therefore nondecreasing
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3)
    case _ => }
    // the walk ends at (P, N); both classes must be populated for the
    // curve to mean anything
    val (p, n) = (rows.last._2, rows.last._3)
    assert(p > 0 && n > 0, s"degenerate label split P=$p N=$n")
    assert(rows.last._4 == 1.0 && rows.last._5 == 1.0)
    val auc = rows.head._6
    assert(rows.forall(_._6 == auc), "auc constant across curve rows")
    assert(auc >= 0.0 && auc <= 1.0)
    // independent recompute: probability a random (pos, neg) pair is
    // ranked correctly, ties at half (the Mann-Whitney identity)
    val lab = ops.TextAnalysis.t15.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val q = ops.TextAnalysis.t02.run(spark, sf).collect()
      .map(r => r.getLong(0) -> math.round(r.getAs[Double]("quality") * 1e6))
      .toMap
    // toSeq BEFORE map: mapping a key Set to scores would dedup ties
    val pos = q.toSeq.collect { case (id, s) if lab(id) => s }
    val neg = q.toSeq.collect { case (id, s) if !lab(id) => s }
    val wins = (for (a <- pos; b <- neg)
      yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    val want = wins / (pos.size.toLong * neg.size)
    assert(math.abs(auc - want) < 1e-12,
      s"auc $auc vs Mann-Whitney $want")
  }

  test("ml20: PR laws hold and AP equals a driver-side recompute") {
    val rows = ops.MLClassify.ml20.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // descending score; tp/fp cumulative therefore nondecreasing
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3)
    case _ => }
    val p = rows.last._2
    assert(p > 0 && rows.last._3 > 0, "degenerate label split")
    // recall walks to 1; precision stays in (0, 1] wherever defined
    assert(rows.last._5 == 1.0)
    rows.foreach { r =>
      assert(r._4 > 0.0 - 1e-15 && r._4 <= 1.0 && r._5 >= 0.0 &&
        r._5 <= 1.0, s"precision/recall out of range: $r")
      assert(r._4 == r._2.toDouble / (r._2 + r._3))
      assert(r._5 == r._2.toDouble / p)
    }
    val ap = rows.head._6
    assert(rows.forall(_._6 == ap), "ap constant across curve rows")
    assert(ap >= 0.0 && ap <= 1.0)
    // independent sequential recompute with the op's own nano
    // quantisation (per-row IEEE arithmetic, exact integer sum)
    var prevTp = 0L
    var nanos = 0L
    rows.foreach { r =>
      nanos += math.round(
        (r._2 - prevTp).toDouble * (r._2.toDouble / (r._2 + r._3)) * 1e9)
      prevTp = r._2
    }
    assert(ap == nanos.toDouble / 1e9 / p,
      s"ap $ap vs step recompute ${nanos.toDouble / 1e9 / p}")
    // anti-vacuity: the curve has at least two operating points (a
    // single score bucket would make the walk, and this test, trivial)
    assert(rows.length >= 2, "degenerate single-threshold curve")
  }

  test("ml05: calibration bins partition the corpus; ECE equals the textbook recompute") {
    val rows = ops.MLClassify.ml05.run(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length >= 2, "degenerate reliability diagram: <2 bins")
    // bins partition the scored corpus exactly
    val lab = ops.TextAnalysis.t15.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val quality = ops.TextAnalysis.t02.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(rows.map(_._2).sum == quality.size.toLong,
      "bin sizes do not sum to the scored corpus")
    // per-bin laws: bin in [0,9], conf inside the bin's interval (up to
    // the micro rounding), acc = pos/n
    for ((bin, n, pos, conf, acc, _) <- rows) {
      assert(bin >= 0 && bin <= 9 && n > 0 && pos >= 0 && pos <= n)
      assert(acc == pos.toDouble / n)
      assert(conf >= bin / 10.0 - 1e-6 &&
        conf <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin mean confidence $conf outside its interval")
    }
    // ECE: constant across rows and equal to an independent driver-side
    // recompute of the textbook sum over the same micro quantisation
    val ece = rows.head._6
    assert(rows.forall(_._6 == ece), "ece constant across bins")
    val micro = quality.map { case (id, v) => id -> math.round(v * 1e6) }
    val byBin = quality.groupBy { case (_, v) =>
      math.min(math.floor(v * 10.0).toLong, 9L) }
    val nTot = quality.size.toLong
    val want = byBin.values.map { m =>
      val n = m.size.toLong
      val pos = m.keys.count(lab(_)).toLong
      // toSeq BEFORE map (ml03's lesson): a key Set mapped to scores
      // would dedup tied micro values and shrink the sum
      val sSum = m.keys.toSeq.map(micro(_)).sum
      (n.toDouble / nTot) *
        math.abs(pos.toDouble / n - sSum.toDouble / (1e6 * n))
    }.sum
    assert(math.abs(ece - want) < 1e-9, s"ece $ece vs recompute $want")
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("q49: attribution conserves every purchase's value to the micro") {
    import org.apache.spark.sql.functions._
    val rows = ops.Relational.q49.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    assert(rows.map(_._1).toSet.subsetOf(Set("click", "view", "direct")))
    // the conservation law: channel credits + direct = total purchase
    // value, exactly — the integer split leaks nothing
    val credited = rows.map(_._4).sum
    val want = model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(round(value * 1000000.0) AS BIGINT)")))
      .head.getLong(0)
    assert(credited == want, s"credited $credited != purchases $want")
    // direct is the no-touch remainder: zero touch events by definition
    rows.filter(_._1 == "direct").foreach { r =>
      assert(r._2 == 0L, "direct channel cannot have touch events")
    }
    // the split actually split something: touch channels carry credit
    assert(rows.exists(r => r._1 != "direct" && r._4 > 0L),
      "no touch channel credited — window degenerate")
  }

  test("q50: session-scoped paths equal a sequential recompute") {
    import org.apache.spark.sql.functions._
    val got = ops.Relational.q50.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val ev0 = model.Tables.events(spark, sf)
    val evs = ev0.select(col("user_id"), col("event_id"), col("event_type"),
      ops.EventStreams.eventMicros(ev0).as("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // sequential sessionisation + trigram count
    val counts = scala.collection.mutable.Map.empty[(String, String, String), Long]
    evs.groupBy(_._1).values.foreach { g =>
      val ordered = g.sortBy(e => (e._4, e._2))
      // split into 30-minute-gap sessions
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, e) => acc match {
          case (h @ (last :: _)) :: t if e._4 - last._4 <= 1800000000L =>
            (e :: h) :: t
          case _ => List(e) :: acc
        }
      }.map(_.reverse)
      sessions.foreach { sess =>
        sess.map(_._3).sliding(3).foreach {
          case Seq(a, b, c) =>
            counts((a, b, c)) = counts.getOrElse((a, b, c), 0L) + 1
          case _ =>
        }
      }
    }
    val tot = counts.values.sum
    val want = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((path, n, share), (wPath, wN)) =>
      assert(path == wPath && n == wN, s"$path/$n vs $wPath/$wN")
      assert(share == n * 1000000L / tot, s"$path share")
    }
  }

  test("ml08: threshold sweep laws and the F1-max election") {
    val rows = ops.MLClassify.ml08.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.length > 1, "need a non-trivial sweep")
    // sorted θ DESC: tp and fp are non-decreasing cumulative walks,
    // tp + fn is the constant positive total
    val p = rows.head._2 + rows.head._4
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._1 > b._1, "thetas strictly descending")
      assert(b._2 >= a._2 && b._3 >= a._3, "cumulative walk decreasing")
    }
    rows.foreach { case (th, tp, fp, fn, prec, rec, f1, _) =>
      assert(tp + fn == p, s"theta $th: tp+fn != P")
      if (tp + fp > 0)
        assert(prec == tp * 1000000L / (tp + fp), s"theta $th precision")
      assert(rec == tp * 1000000L / p, s"theta $th recall")
      assert(f1 == 2 * tp * 1000000L / (2 * tp + fp + fn), s"theta $th f1")
    }
    // the last row (θ = min score) predicts everything positive
    assert(rows.last._6 == 1000000L, "min-theta recall must be 1")
    // election: exactly one chosen row; it has the max F1, and among
    // F1 ties the highest theta
    val chosen = rows.filter(_._8)
    assert(chosen.length == 1, s"${chosen.length} chosen rows")
    val bf = rows.map(_._7).max
    assert(chosen.head._7 == bf, "chosen row is not the F1 max")
    assert(chosen.head._1 == rows.filter(_._7 == bf).map(_._1).max,
      "F1 tie must break to the highest theta")
  }

  test("q52: unpivot(pivot(x)) equals the direct long-form aggregation") {
    val got = ops.Relational.q52.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = model.Tables.orders(spark, sf)
      .join(model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(model.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_orderstatus").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every nonzero cell agrees; zero cells exist only in the unpivoted
    // (dense) side — pivot materialises the full grid
    direct.foreach { case (k, v) => assert(got(k) == v, s"cell $k") }
    got.foreach { case (k, v) =>
      assert(v == direct.getOrElse(k, 0L), s"cell $k dense check")
    }
    assert(got.values.sum == direct.values.sum)
  }

  test("ml11: drift report laws and the summary row arithmetic") {
    val rows = ops.MLClassify.ml11.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val (summary, detail) = rows.partition(_._1 == -1L)
    assert(summary.length == 1 && detail.nonEmpty)
    val s0 = summary.head
    assert(s0._2 == detail.map(_._2).sum && s0._3 == detail.map(_._3).sum)
    // floor-ppm frequencies sum to <= 1e6 with at most one ppm lost per bucket
    assert(s0._4 <= 1000000L && s0._4 > 1000000L - detail.length)
    assert(s0._5 <= 1000000L && s0._5 > 1000000L - detail.length)
    // TV distance = half the L1, bounded by [0, 1e6]
    assert(s0._6 == detail.map(_._6).sum / 2)
    assert(s0._6 >= 0 && s0._6 <= 1000000L)
    // the two windows genuinely differ somewhere (drift is measurable)
    assert(detail.exists(_._6 > 0))
    // per-bucket ppm recompute
    detail.foreach { case (_, nr, nc, rp, cp, ad) =>
      assert(rp == nr * 1000000L / s0._2 && cp == nc * 1000000L / s0._3)
      assert(ad == math.abs(rp - cp))
    }
  }

  test("ml12: segment report partitions ml06 predictions; gap arithmetic holds") {
    val rows = ops.MLClassify.ml12.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (overall, per) = rows.partition(_._1 == "__overall__")
    assert(overall.length == 1 && per.nonEmpty)
    // the segments partition the eval set exactly
    assert(per.map(_._2).sum == overall.head._2)
    assert(per.map(_._3).sum == overall.head._3)
    // direct recompute from ml06 + documents
    val preds = ops.MLClassify.ml06.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == r.getString(3))).toMap
    val src = model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    per.foreach { case (seg, ne, nc, acc) =>
      val ids = preds.keys.filter(src(_) == seg)
      assert(ne == ids.size.toLong, s"segment $seg n_eval")
      assert(nc == ids.count(preds).toLong, s"segment $seg n_correct")
      assert(acc == nc * 1000000L / ne)
    }
    // the report is informative: segments do not all share one accuracy
    val gap = per.map(_._4).max - per.map(_._4).min
    info(s"worst-group gap ${gap} ppm across ${per.length} segments")
    assert(per.map(_._4).distinct.length > 1,
      "all segments identical - slice analysis is vacuous on this corpus")
  }

  test("ml13: OLS fit equals an exact BigInt normal-equation recompute") {
    val row = ops.MLClassify.ml13.run(spark, sf).collect().head
    val (n, b0n, b1n, b2n, r2) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4))
    // driver-side recompute from the raw per-order features
    val xy = model.Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(count(lit(1)).cast("long").as("x1"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).cast("long").as("x2"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).cast("long")
          .as("y"))
      .collect().map(r => (BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        BigInt(r.getLong(3))))
    val bn = BigInt(xy.length)
    val (s1, s2, sy) = (xy.map(_._1).sum, xy.map(_._2).sum, xy.map(_._3).sum)
    val s11 = xy.map(t => t._1 * t._1).sum
    val s12 = xy.map(t => t._1 * t._2).sum
    val s22 = xy.map(t => t._2 * t._2).sum
    val s1y = xy.map(t => t._1 * t._3).sum
    val s2y = xy.map(t => t._2 * t._3).sum
    val syy = xy.map(t => t._3 * t._3).sum
    val (a11, a12, a22) = (bn * s11 - s1 * s1, bn * s12 - s1 * s2,
      bn * s22 - s2 * s2)
    val (c1, c2) = (bn * s1y - s1 * sy, bn * s2y - s2 * sy)
    val det = a11 * a22 - a12 * a12
    val beta1 = (a22 * c1 - a12 * c2).toDouble / det.toDouble
    val beta2 = (a11 * c2 - a12 * c1).toDouble / det.toDouble
    val beta0 = (sy.toDouble - beta1 * s1.toDouble - beta2 * s2.toDouble) /
      bn.toDouble
    assert(n == xy.length)
    assert(b0n == math.round(beta0 * 1e9), s"beta0 $b0n vs $beta0")
    assert(b1n == math.round(beta1 * 1e9), s"beta1 $b1n vs $beta1")
    assert(b2n == math.round(beta2 * 1e9), s"beta2 $b2n vs $beta2")
    // exact-integer SSE/SST replay
    val sse = xy.map { case (x1, x2, y) =>
      val yh = BigInt(math.round(beta0 + beta1 * x1.toDouble +
        beta2 * x2.toDouble))
      (y - yh) * (y - yh)
    }.sum
    val sst = bn * syy - sy * sy
    assert(BigInt(r2) == BigInt(1000000) - (bn * sse * 1000000) / sst)
    assert(r2 > 500000, s"fit explains under half the variance ($r2 ppm) - " +
      "target/feature pairing is vacuous")
    info(s"n=$n r2=${r2 / 10000.0}%")
  }

  test("q55 constraint audit equals a sequential rule-book replay") {
    val got = ops.Relational.q55.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    val li = model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getDouble(2), r.getDouble(3), r.getString(4), r.get(5).toString))
    val ord = model.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
    val cust = model.Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    def row(n: Long, viol: Seq[Long]): (Long, Long, Long, Option[Long]) =
      (n, viol.size.toLong, viol.size.toLong * 1000000L / n,
        viol.minOption)
    val expected = Map(
      "li_qty_range" -> row(li.length,
        li.filter(r => r._3 < 1 || r._3 > 40).map(_._1).toSeq),
      "li_discount_max" -> row(li.length,
        li.filter(_._4 > 0.07).map(_._1).toSeq),
      "li_flag_domain" -> row(li.length,
        li.filterNot(r => Set("A", "N", "R")(r._5)).map(_._1).toSeq),
      "li_line_unique" -> {
        val g = li.groupBy(r => (r._1, r._2))
        row(g.size.toLong, g.filter(_._2.length > 1).keys.toSeq.map(_._1))
      },
      "li_order_ri" -> {
        val oks = ord.map(_._1).toSet
        val dk = li.map(_._1).distinct
        row(dk.length, dk.filterNot(oks).toSeq)
      },
      "ord_cust_ri" -> row(ord.length,
        ord.filterNot(o => cust(o._2)).map(_._1).toSeq),
      "li_ship_after_order" -> {
        val od = ord.map(o => o._1 -> o._3).toMap
        row(li.length, li.filter(r => r._6 < od(r._1)).map(_._1).toSeq)
      })
    assert(got == expected)
    // the audit must separate dirty from clean on this corpus
    assert(got.values.count(_._2 > 0) >= 3, "too few firing rules - vacuous")
    assert(got.values.count(_._2 == 0) >= 2, "no clean rules - rule book broken")
    // sample keys: present iff violations exist
    got.foreach { case (c, (_, v, _, k)) =>
      assert(k.isDefined == (v > 0), s"rule $c sample-key presence")
    }
  }

  test("ml14: split table equals an exact BigInt recompute; the cut is informative") {
    val got = ops.MLClassify.ml14.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    val rows = model.Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (math.round(r.getDouble(0)), math.round(r.getDouble(1) * 100),
        if (r.getDouble(2) > 5000) "hi" else "lo"))
    val S = BigInt(1000000000000L)
    def splits(feat: String, vs: Array[(Long, String)]) = {
      val hist = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val classes = vs.map(_._2).distinct.sorted
      val thetas = vs.map(_._1).distinct.sorted
      thetas.map { th =>
        val lc = classes.map(c => hist.collect {
          case ((v, `c`), n) if v <= th => n }.sum)
        val rc = classes.map(c => hist.collect {
          case ((v, `c`), n) if v > th => n }.sum)
        val (nl, nr) = (lc.sum, rc.sum)
        val score = if (nr == 0) BigInt(-1)
        else lc.map(x => BigInt(x) * x).sum * S / nl +
          rc.map(x => BigInt(x) * x).sum * S / nr
        (feat, th, nl, nr, score)
      }.filter(_._5 >= 0)
    }
    val exp = splits("qty", rows.map(r => (r._1, r._3))) ++
      splits("disc", rows.map(r => (r._2, r._3)))
    assert(got.size == exp.size)
    val best = exp.maxBy(t => (t._5, t._1, t._2))(
      Ordering.Tuple3(Ordering.BigInt, Ordering.String.reverse,
        Ordering.Long.reverse))
    exp.foreach { case (f, th, nl, nr, sc) =>
      val chosen = if ((f, th) == ((best._1, best._2))) 1 else 0
      assert(got((f, th)) == ((nl, nr, sc.toLong, chosen)), s"split $f<=$th")
    }
    // informativeness: the elected split strictly beats no-split purity
    val n = rows.length
    val baseline = rows.groupBy(_._3).values
      .map(g => BigInt(g.length) * g.length).sum * S / n
    assert(best._5 > baseline,
      s"best split ${best._5} does not improve on baseline $baseline")
    info(s"chosen ${best._1}<=${best._2}, gain " +
      s"${(best._5 - baseline) / BigInt(n)} micro-purity")
  }

  test("ml18: staged boosting equals an exact recompute; round 2 strictly improves; stumps differ") {
    val got = ops.MLClassify.ml18.run(spark, sf).collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 2)
    // independent recompute: per-order cells, then both rounds in BigInt
    val cells = model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1)),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).values.map { ls =>
        val rev = ls.map(_._3).sum
        (ls.length.toLong, ls.map(_._2).sum,
          if (rev > 15000000L && rev <= 30000000L) 1000L else 0L)
      }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val n = BigInt(cells.map(_._2).sum)
    // exact least-squares stump fit on (cell -> target) — trunc-division
    // throughout (BigInt / truncates toward zero, as Spark div does)
    def fit(t: ((Long, Long, Long)) => Long): (String, Long, Long, Long) = {
      val cands = Seq("items" -> ((c: (Long, Long, Long)) => c._1),
        "sumqty" -> ((c: (Long, Long, Long)) => c._2)).flatMap {
        case (feat, fv) =>
          val marg = cells.groupBy { case (c, _) => fv(c) }.view.mapValues {
            g => (g.map(_._2).sum, g.map { case (c, m) => m * t(c) }.sum)
          }.toSeq.sortBy(_._1)
          val (nt, st) = (marg.map(_._2._1).sum, marg.map(_._2._2).sum)
          marg.scanLeft((0L, 0L, 0L)) { case ((_, nl, sl), (v, (m, sy))) =>
            (v, nl + m, sl + sy)
          }.drop(1).filter(_._2 < nt).map { case (v, nl, sl) =>
            val (nr, sr) = (nt - nl, st - sl)
            val gain = BigInt(sl) * sl / nl + BigInt(sr) * sr / nr
            (feat, v, gain, sl / nl, sr / nr)
          }
      }
      val best = cands.minBy { case (f, v, g, _, _) => (-g, f, v) }(
        Ordering.Tuple3(Ordering.BigInt, Ordering.String, Ordering.Long))
      (best._1, best._2, best._4, best._5)
    }
    def leafOf(e: (String, Long, Long, Long), c: (Long, Long, Long)): Long = {
      val v = if (e._1 == "items") c._1 else c._2
      if (v <= e._2) e._3 else e._4
    }
    def measure(f: ((Long, Long, Long)) => Long): (Long, Long) = {
      val corr = cells.collect { case (c, m)
        if (f(c) >= 500) == (c._3 >= 500) => BigInt(m) }.sum
      val se = cells.map { case (c, m) =>
        BigInt(m) * (c._3 - f(c)) * (c._3 - f(c)) }.sum
      ((corr * 1000000 / n).toLong, (se / n).toLong)
    }
    val e1 = fit(_._3)
    val (acc1, mse1) = measure(leafOf(e1, _))
    val e2 = fit(c => c._3 - leafOf(e1, c))
    val (acc2, mse2) = measure(c => leafOf(e1, c) + leafOf(e2, c))
    assert(got(0) == ((1, e1._1, e1._2, e1._3, e1._4, acc1, mse1)),
      s"round 1 mismatch: ${got(0)} vs $e1/$acc1/$mse1")
    assert(got(1) == ((2, e2._1, e2._2, e2._3, e2._4, acc2, mse2)),
      s"round 2 mismatch: ${got(1)} vs $e2/$acc2/$mse2")
    // the boosting contract: the staged model strictly improves both
    // metrics, and round 2 elected a genuinely different stump
    assert(got(1)._6 > got(0)._6,
      s"staged accuracy did not strictly improve: ${got(0)._6} -> ${got(1)._6}")
    assert(got(1)._7 < got(0)._7,
      s"staged MSE did not strictly decrease: ${got(0)._7} -> ${got(1)._7}")
    assert((got(0)._2, got(0)._3) != ((got(1)._2, got(1)._3)),
      "round 2 re-elected round 1's stump")
    info(s"acc ${got(0)._6} -> ${got(1)._6} ppm, mse ${got(0)._7} -> " +
      s"${got(1)._7} pm², stumps ${got(0)._2}<=${got(0)._3} then " +
      s"${got(1)._2}<=${got(1)._3}")
  }

  test("q56 hierarchy: recursion laws hold at every node") {
    val got = ops.Relational.q56.run(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val own = model.Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(got.keySet == own.keySet)
    val children = own.keySet.groupBy(c => (c + 1) / 10 - 1)
      .map { case (p, cs) => p -> cs.filter(c => (c + 1) / 10 >= 1) }
    got.foreach { case (c, (depth, sub, nn)) =>
      assert(depth == (c + 1).toString.length - 1, s"depth of $c")
      val kids = children.getOrElse(c, Set.empty[Long])
        .filter(k => k != c && got.contains(k))
      // the defining recursion: subtree = own + children's subtrees
      assert(sub == own(c) + kids.toSeq.map(k => got(k)._2).sum,
        s"subtree sum at $c")
      assert(nn == 1 + kids.toSeq.map(k => got(k)._3).sum, s"node count at $c")
    }
    // conservation: the roots partition the forest
    val roots = got.filter { case (c, _) => c + 1 <= 9 }
    assert(roots.values.map(_._3).sum == got.size)
    assert(roots.values.map(_._2).sum == own.values.sum)
    assert(got.values.map(_._1).max >= 2, "hierarchy too shallow - vacuous")
  }

  test("q57 skew report equals a sequential key-histogram recompute") {
    val got = ops.Relational.q57.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    def ref(keys: Array[Long]): (Long, Long, Long, Long, Long, Long) = {
      val h = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = keys.length.toLong
      val nk = h.size.toLong
      val mx = h.values.max
      // smallest key among the hottest
      val hot = h.filter(_._2 == mx).keys.min
      (n, nk, hot, mx, mx * nk * 1000000L / n, (mx * nk + n - 1) / n)
    }
    assert(got("events.user_id") == ref(model.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))))
    assert(got("lineitem.l_orderkey") == ref(model.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))))
    assert(got("orders.o_custkey") == ref(model.Tables.orders(spark, sf)
      .select("o_custkey").collect().map(_.getLong(0))))
    // laws: imbalance >= 1e6 (max >= mean) and salt >= 1; and the report
    // genuinely separates balanced from skewed keys on this corpus
    got.values.foreach { case (_, _, _, _, imb, salt) =>
      assert(imb >= 1000000L && salt >= 1L)
    }
    assert(got.values.map(_._5).max > 2 * got.values.map(_._5).min,
      "all keys equally balanced - advisor has nothing to advise on")
  }

  test("ml15 quantised serving: quantiser laws and a non-vacuous trade") {
    val r = ops.MLClassify.ml15.run(spark, sf).collect().head
    val (n, agree, agreePpm, accF, accQ, tFull, tQuant) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
    assert(agreePpm == agree * 1000000L / n)
    assert(tQuant <= tFull)
    // quantisation must genuinely perturb the ranking on this corpus
    // (else the report proves nothing) while staying near-faithful
    assert(agree < n, "quantised model identical - trade is vacuous")
    assert(agreePpm > 900000L, s"agreement $agreePpm ppm - model destroyed")
    // accuracy moves by less than the agreement gap can explain
    assert(math.abs(accF - accQ) <= (1000000L - agreePpm),
      "accuracy delta exceeds the disagreement mass")
    // quantiser law on the actual model: q = round-half-up(cnt*127/max),
    // clamped to [0, 127], monotone in cnt
    val cnts = Seq(1L, 3L, 64L, 127L, 128L)
    cnts.foreach { m =>
      (1L to m).foreach { c =>
        val q = (c * 254 + m) / (2 * m)
        assert(q >= 0 && q <= 127)
        assert(q == math.round(c * 127.0 / m) ||
          // .5 boundary: integer form rounds half UP by construction
          (c * 254 % (2 * m) == m && q == c * 127 / m + 1))
      }
    }
  }

}

package graft

import org.apache.spark.sql.functions._

/** Pins g01 PageRank: probability-distribution law, bit-determinism, and
  * exact agreement with an independent driver-side reimplementation of
  * the quantised iteration (the ConnectedComponentsSpec discipline —
  * the distributed dataflow vs a sequential reference on the same
  * graph). */
class GraphSpec extends SparkSpec {

  test("g01: ranks form a probability distribution, bit-deterministic") {
    val a = ops.Graph.g01.run(spark, sf).collect()
    assert(a.nonEmpty)
    val mass = a.map(_.getDouble(1)).sum
    // quantisation loses < 0.85 * 0.5e-12 per edge per round
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")
    assert(a.forall(_.getDouble(1) > 0))
    val b = ops.Graph.g01.run(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("g01: distributed ranks equal a sequential quantised PageRank") {
    import spark.implicits._
    val pairs = model.Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct().as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (p, sp) =>
      Seq((s"p:$p", s"s:$sp"), (s"s:$sp", s"p:$p"))
    }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length.toDouble
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val incoming = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    // Spark's Round(DoubleType) = BigDecimal.valueOf(x).setScale(0, HALF_UP)
    def sparkRound(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      r = nodes.map { v =>
        val m = incoming.getOrElse(v, Array.empty[String])
          .map(u => sparkRound(r(u) / deg(u) * 1000000000000.0)).sum
        v -> (0.15 / n + 0.85 * (m.toDouble / 1000000000000.0))
      }.toMap
    }
    val dist = ops.Graph.g01.run(spark, sf).collect()
      .map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(dist.keySet == r.keySet)
    // identical integer sums + identical double assembly → bit-equal
    dist.foreach { case (node, pr) =>
      assert(pr == r(node), s"$node: distributed $pr vs sequential ${r(node)}")
    }
  }

  test("g02: projection equals a driver-side recompute; pairs canonical") {
    import spark.implicits._
    val pairs = model.Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct().as[(Long, Long)].collect()
    val byPart = pairs.groupBy(_._1).map { case (pk, v) => pk -> v.map(_._2) }
    val expected = byPart.toSeq
      .filter(_._2.length <= ops.Graph.ProjDegCap) // the hub cap
      .flatMap { case (_, sks) =>
        val l = sks.toSeq
        for (a <- l; b <- l if a < b) yield (a, b)
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val got = ops.Graph.g02.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    // canonical orientation: s1 < s2, no self-pairs, no duplicates
    assert(got.keys.forall { case (a, b) => a < b })
  }

  test("g03: per-node triangle counts equal a brute-force driver recompute") {
    import spark.implicits._
    // rebuild the projected edge set the way g02's recompute does
    val pairs = model.Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct().as[(Long, Long)].collect()
    val weighted = pairs.groupBy(_._1).toSeq
      .filter(_._2.length <= ops.Graph.ProjDegCap)
      .flatMap { case (_, v) =>
        val l = v.map(_._2).toSeq
        for (a <- l; b <- l if a < b) yield (a, b)
      }
      // NB: .collect{case (k,v) if ... => k} would rebuild a MAP here
      // (tuple results re-key), silently deduplicating edges by s1
      .groupBy(identity).view.mapValues(_.size).toMap
      .filter(_._2 >= 2)
    // mutual top-k sparsification: neighbour ranked (weight desc, id)
    val topk = weighted.toSeq
      .flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
      .groupBy(_._1).toSeq // toSeq first: flatMap on a Map would re-key
      .flatMap { case (v, nbs) =>
        nbs.sortBy(t => (-t._3, t._2)).take(ops.Graph.TriTopK)
          .map(t => (v, t._2))
      }.toSet
    val edges = weighted.keySet
      .filter { case (a, b) => topk((a, b)) && topk((b, a)) }
    val adj = (edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // enumerate each triangle once as a < b < c
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      (adj(a) & adj(b)).filter(_ > b).foreach { c =>
        Seq(a, b, c).foreach(v => triCount(v) += 1)
      }
    }
    val expected = triCount.toMap.filter(_._2 > 0)
    val got = ops.Graph.g03.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"got ${got.size} nodes, expected ${expected.size}")
    // every triangle contributes exactly 3 corner participations
    assert(got.values.sum % 3 == 0)

    // g04 on the same graph: degree from the sparsified edge set,
    // coefficient = the one fixed double expression
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cc = ops.Graph.g04.run(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(cc.keySet == deg.keySet)
    cc.foreach { case (node, (d, t, c)) =>
      assert(d == deg(node), s"$node degree")
      assert(t == expected.getOrElse(node, 0L), s"$node triangles")
      val want = if (d >= 2) 2.0 * t / (d * (d - 1)) else 0.0
      assert(c == want, s"$node clustering $c vs $want")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("g06: two LPA rounds equal a sequential recompute; round 1 is min-neighbour") {
    import spark.implicits._
    val got = ops.Graph.g06.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // sequential synchronous LPA over the same sparsified edge set
    val edges = ops.Graph.projectionEdges(spark, sf)
      .as[(Long, Long)].collect()
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1).toSeq
      .map { case (v, es) => v -> es.map(_._2).toSeq }.toMap
    def round(lbl: Map[Long, Long]): Map[Long, Long] =
      nbrs.map { case (v, ns) =>
        val votes = ns.map(lbl).groupBy(identity).view.mapValues(_.size)
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    val l0 = nbrs.keys.map(v => v -> v).toMap
    val l1 = round(l0)
    // round-1 closed form: identity labels make every vote count 1, so
    // the (count DESC, label ASC) tie-break elects the min neighbour id
    for ((v, ns) <- nbrs)
      assert(l1(v) == ns.min, s"round-1 label of $v is not min neighbour")
    val l2 = round(l1)
    val sizes = l2.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(got.length == nbrs.size, "one row per vertex")
    for ((node, label, csize) <- got) {
      assert(l2(node) == label, s"node $node label $label vs ${l2(node)}")
      assert(csize == sizes(label).toLong)
    }
    // anti-vacuity: propagation must have merged something — some
    // community holds >1 member, and fewer labels exist than vertices
    assert(sizes.values.exists(_ > 1), "no community larger than 1")
    assert(sizes.size < nbrs.size, "labels never merged")
  }

  test("g07: two mean layers equal a sequential message-passing recompute") {
    import spark.implicits._
    val got = ops.Graph.g07.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val edges = ops.Graph.projectionEdges(spark, sf)
      .as[(Long, Long)].collect()
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1).toSeq
      .map { case (v, es) => v -> es.map(_._2).toSeq }.toMap
    val bal = model.Tables.supplier(spark, sf)
      .selectExpr("s_suppkey",
        s"CAST(round(s_acctbal * 100) AS BIGINT) + ${ops.Graph.GnnFeatOffset}")
      .as[(Long, Long)].collect().toMap
    def layer(h: Map[Long, Long]): Map[Long, Long] =
      nbrs.map { case (v, ns) =>
        v -> Math.floorDiv(h(v) + ns.map(h).sum, ns.size + 1L)
      }
    val h0 = nbrs.keys.map(v => v -> bal(v)).toMap
    val h1 = layer(h0)
    val h2 = layer(h1)
    assert(got.length == nbrs.size, "one row per projection vertex")
    for ((node, deg, c0, g1, g2) <- got) {
      assert(deg == nbrs(node).size.toLong, s"node $node degree")
      assert(c0 == h0(node), s"node $node input feature")
      assert(g1 == h1(node), s"node $node layer-1 mean")
      assert(g2 == h2(node), s"node $node layer-2 mean")
    }
    // anti-vacuity: aggregation must actually smooth — some node's h1
    // differs from its own input feature, and h2 from h1
    assert(got.exists(r => r._4 != r._3), "layer 1 changed nothing")
    assert(got.exists(r => r._5 != r._4), "layer 2 changed nothing")
  }

  test("g08: unrolled peel rounds equal a sequential k-core peeling") {
    import spark.implicits._
    val k = ops.Graph.CoreK
    val got = ops.Graph.g08.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5)))
    assert(got.nonEmpty)
    val edges = ops.Graph.projectionEdges(spark, sf)
      .as[(Long, Long)].collect()
    var nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(got.length == nbrs.size, "one row per projection node")
    got.foreach { case (v, deg, _, _, _, _) =>
      assert(deg == nbrs(v).size.toLong, s"node $v degree")
    }
    // sequential peel: repeatedly drop deg<k nodes, shrink neighbour sets
    def peelOnce(m: Map[Long, Set[Long]]): Map[Long, Set[Long]] = {
      val surv = m.filter(_._2.size >= k).keySet
      m.collect { case (v, ns) if surv(v) => v -> ns.intersect(surv) }
    }
    val after1 = peelOnce(nbrs)
    val after2 = peelOnce(after1)
    val after3 = peelOnce(after2)
    got.foreach { case (v, _, r1, r2, inCore, coreDeg) =>
      assert(r1 == after1.contains(v), s"node $v round-1 survival")
      assert(r2 == after2.contains(v), s"node $v round-2 survival")
      assert(coreDeg == after3.get(v).map(_.size.toLong).getOrElse(0L),
        s"node $v core degree")
      assert(inCore == (after3.contains(v) && after3(v).size >= k),
        s"node $v core membership")
    }
    // core laws: members keep >= k neighbours INSIDE the reported core,
    // and the peel genuinely removed something on this corpus
    val core = got.filter(_._5).map(_._1).toSet
    got.filter(_._5).foreach { case (v, _, _, _, _, coreDeg) =>
      assert(coreDeg >= k, s"core node $v below order $k")
    }
    assert(core.nonEmpty, "empty core — nothing to assert against")
    assert(core.size < got.length, "peeling removed nothing")
    // fixpoint report for the log: does one more round change anything?
    val after4 = peelOnce(after3)
    info(s"core |V|=${core.size} of ${got.length}; " +
      s"fixpoint by round 3: ${after4.keySet == after3.keySet}")
  }

  test("g09: three relaxation rounds equal a sequential BFS to depth 3") {
    import spark.implicits._
    val got = ops.Graph.g09.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = ops.Graph.projectionEdges(spark, sf)
      .as[(Long, Long)].collect()
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seeds = nbrs.keySet.filter(_ % 19 == 0)
    assert(seeds.nonEmpty, "seed congruence class empty on this corpus")
    // sequential frontier BFS, capped at 3 hops
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1L to 3L) {
      frontier = frontier.flatMap(nbrs(_)).filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    assert(got == dist, s"BFS disagreement: ${(got.toSet diff dist.toSet).take(3)}")
    // non-vacuity: the horizon must matter — some node beyond the 1-ring
    assert(got.values.exists(_ >= 2L), "no node beyond the seeds' 1-ring")
    info(s"|seeds|=${seeds.size}, reached ${got.size}/${nbrs.size} " +
      s"nodes, max hops ${got.values.max}")
  }

  test("g10: personalized ranks equal a sequential quantised PPR recompute") {
    import spark.implicits._
    val pairs = model.Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct().as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (p, sp) =>
      Seq((s"p:$p", s"s:$sp"), (s"s:$sp", s"p:$p"))
    }
    val nodes = edges.map(_._1).distinct.sorted
    val seeds = pairs.map(_._2).distinct.filter(_ % 19 == 0)
      .map(sk => s"s:$sk").toSet
    assert(seeds.nonEmpty)
    val ns = seeds.size.toDouble
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val incoming = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    def sparkRound(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var r = nodes.map(v => v -> (if (seeds(v)) 1.0 / ns else 0.0)).toMap
    for (_ <- 1 to 3) {
      r = nodes.map { v =>
        val m = incoming.getOrElse(v, Array.empty[String])
          .map(u => sparkRound(r(u) / deg(u) * 1000000000000.0)).sum
        v -> (0.15 * (if (seeds(v)) 1.0 / ns else 0.0) +
          0.85 * (m.toDouble / 1000000000000.0))
      }.toMap
    }
    val dist = ops.Graph.g10.run(spark, sf).collect()
      .map(row => row.getString(0) -> row.getDouble(1)).toMap
    val expected = r.filter(_._2 > 0)
    assert(dist.keySet == expected.keySet,
      s"row set: ${dist.size} vs ${expected.size}")
    dist.foreach { case (node, pr) =>
      assert(pr == expected(node), s"$node: $pr vs ${expected(node)}")
    }
    // locality: every seed holds positive rank, and the restart makes
    // seeds outrank the median positive node
    seeds.foreach(v => assert(dist.getOrElse(v, 0.0) > 0))
    val med = dist.values.toSeq.sorted.apply(dist.size / 2)
    assert(seeds.forall(v => dist(v) >= med))
    // some node of the graph is genuinely unreached within 3 hops OR
    // the graph is fully covered - report either way
    info(s"positive-rank nodes ${dist.size} of ${nodes.length}, " +
      s"|seeds|=${seeds.size}")
  }

  test("g11: sketch output equals a sequential BFS-ball + HLL recompute") {
    val got = ops.Graph.g11.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // sequential reference: exact balls, singleton registers, max-merge
    val pairs = model.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (s"p:${r.getLong(0)}", s"s:${r.getLong(1)}"))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val nodes = adj.keySet
    def hex(sd: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(sd.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def sketch(v: String): (Int, Int) = {
      val h = hex(v)
      val reg = Integer.parseInt(h.substring(0, 1), 16)
      val t = h.substring(1, 14).dropWhile(_ == '0')
      val rho = if (t.isEmpty) 53
      else (13 - t.length) * 4 + (t.head match {
        case '1' => 3
        case '2' | '3' => 2
        case '4' | '5' | '6' | '7' => 1
        case _ => 0
      }) + 1
      (reg, rho)
    }
    val lc = (1 to 16).map(vv => math.round(16.0 * math.log(16.0 / vv) * 1e6))
    def estOf(regs: Map[Int, Int]): (Long, Long) = {
      val occupied = regs.size.toLong
      val denom = regs.values.map(r => BigInt(1) << (53 - r)).sum +
        BigInt(16 - regs.size) * (BigInt(1) << 53)
      val raw = ((BigInt(673000) * 256 * (BigInt(1) << 53)) / denom)
        .min(BigInt("1000000000000000")).toLong
      val est = if (occupied < 16 && raw <= 40000000L)
        lc((16 - regs.size) - 1) else raw
      (occupied, est)
    }
    var ball: Map[String, Set[String]] = nodes.map(v => v -> Set(v)).toMap
    var exact = Map.empty[(String, Int), Int]
    for (r <- 0 to 2) {
      if (r > 0) ball = ball.map { case (v, b) =>
        v -> (b ++ b.flatMap(u => adj.getOrElse(u, Set.empty[String])))
      }
      // NOTE: ball grows by the NEIGHBOURS of the previous ball, which
      // equals radius-r ball by induction
      nodes.foreach { v =>
        exact += (v, r) -> ball(v).size
        val regs = ball(v).map(sketch).groupBy(_._1)
          .map { case (g, rs) => g -> rs.map(_._2).max }
        assert(got((v, r)) == estOf(regs), s"node $v r=$r")
      }
    }
    assert(got.size == nodes.size * 3)
    // estimate sanity at r=1 (pre-saturation): mean |rel err| within the
    // m=16 sketch's expected band
    val errs = nodes.toSeq.map { v =>
      math.abs(got((v, 1))._2 / 1e6 - exact((v, 1))) / exact((v, 1))
    }
    val mare = errs.sum / errs.size
    info(f"r=1 mean abs rel err $mare%.3f over ${nodes.size} nodes")
    assert(mare < 0.5, f"sketch error $mare%.3f out of band")
  }

  test("g12: rounds equal a sequential Boruvka with full contraction; forest laws") {
    val got = ops.Graph.g12.run(spark, sf).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // rebuild the weighted projection edges sequentially
    val ps = model.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val kept = ps.groupBy(_._1).filter(_._2.length <= 64).values.flatten.toSeq
    val ew = kept.groupBy(_._1).values.flatMap { g =>
      val sks = g.map(_._2).toSeq
      for (a <- sks; b <- sks if a < b) yield (a, b)
    }.groupBy(identity).collect { case ((a, b), es) if es.size >= 2 =>
      (a, b, es.size.toLong)
    }.toSeq
    val nodes = ew.flatMap(e => Seq(e._1, e._2)).distinct
    var comp = nodes.map(v => v -> v).toMap
    (1 to 2).foreach { round =>
      val cross = ew.filter(e => comp(e._1) != comp(e._2))
      val best = (cross.map(e => (comp(e._1), e)) ++
        cross.map(e => (comp(e._2), e)))
        .groupBy(_._1).view.mapValues(_.map(_._2)
          .minBy(e => (-e._3, e._1, e._2))).toMap
      val chosen = best.values.toSet
      assert(got.getOrElse(round, Set.empty) ==
        chosen.map(e => (e._1, e._2, e._3)), s"round $round edge set")
      // full contraction (union-find closure, no jump bound)
      val parent = scala.collection.mutable.Map[Long, Long]() ++
        comp.values.toSet.map((c: Long) => c -> c)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      chosen.foreach { e =>
        val (a, b) = (find(comp(e._1)), find(comp(e._2)))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      comp = comp.map { case (v, c) => v -> find(c) }
    }
    // forest laws over both rounds together
    val all = got.values.flatten.toSet
    assert(all.size == nodes.size - comp.values.toSet.size,
      "chosen edges must number n - components (forest, no cycle)")
    info(s"|V|=${nodes.size}, rounds ${got.view.mapValues(_.size).toMap}, " +
      s"final components ${comp.values.toSet.size}")
    assert(got.size == 2 || comp.values.toSet.size == 1,
      "round 2 empty but graph not fully merged")
  }

  test("g13: harmonic centrality is the clamped-increment fold of g11") {
    val balls = ops.Graph.g11.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    val got = ops.Graph.g13.run(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size * 3 == balls.size, "g13 must cover every g11 node")
    got.foreach { case (v, (b0, b1, b2, h)) =>
      assert(b0 == balls((v, 0)) && b1 == balls((v, 1)) &&
        b2 == balls((v, 2)), s"node $v: ball columns drifted from g11")
      val expect = math.max(b1 - b0, 0L) + math.max(b2 - b1, 0L) / 2
      assert(h == expect, s"node $v: harmonic $h != $expect")
    }
    // centrality genuinely discriminates (not a constant column), and
    // clamping is observable as exact-zero increments somewhere
    // (9 distinct values at sf0.001 — the m=16 sketch quantises hard on
    // a near-saturated small graph; >3 floors a genuinely-flat column)
    assert(got.values.map(_._4).toSet.size > 3, "harmonic is flat")
  }

  test("g14: truss membership equals an unbounded sequential peel") {
    import spark.implicits._
    val got = ops.Graph.g14.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    // reference k-truss: peel edges with in-truss support < k-2 until
    // NOTHING changes — no round bound, so the op's fixpoint assertion
    // (TrussRounds suffice on this corpus) is independently re-proven
    val edges = ops.Graph.projectionEdges(spark, sf)
      .as[(Long, Long)].collect().toSet
    def supportIn(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val nbrs = (es.toSeq ++ es.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      es.toSeq.map { case (a, b) =>
        (a, b) -> (nbrs(a) & nbrs(b)).size
      }.toMap
    }
    def truss(t: Int): Set[(Long, Long)] = {
      var cur = edges
      var changed = true
      while (changed) {
        val keep = supportIn(cur).filter(_._2 >= t).keySet
        changed = keep != cur
        cur = keep
      }
      cur
    }
    val (t3, t4) = (truss(1), truss(2))
    assert(got.keySet == edges, "one row per projection edge")
    for ((e, (sup0, in3, in4, tn)) <- got) {
      assert(in3 == t3(e), s"$e in_truss3")
      assert(in4 == t4(e), s"$e in_truss4")
      assert(tn == 2 + (if (in3) 1 else 0) + (if (in4) 1 else 0))
    }
    // initial supports equal the brute-force recompute on the full set
    val sup = supportIn(edges)
    for ((e, (sup0, _, _, _)) <- got)
      assert(sup0 == sup(e), s"$e sup0")
    // nesting law + non-vacuity: 4-truss ⊆ 3-truss ⊊ edges, 3-truss ≠ ∅
    assert(t4.subsetOf(t3) && t3.nonEmpty && t3 != edges)
  }

  test("g15: link-prediction scores equal a brute-force wedge recompute") {
    import spark.implicits._
    val got = ops.Graph.g15.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    val edges = ops.Graph.projectionEdges(spark, sf)
      .as[(Long, Long)].collect().toSet
    val nbrs = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    // expected candidate set: distance-exactly-2 pairs (≥1 common
    // neighbor, not adjacent), canonically ordered
    val expected = (for {
      (w, ns) <- nbrs.toSeq
      a <- ns; b <- ns if a < b
      if !edges((a, b))
    } yield (a, b)).toSet
    assert(got.keySet == expected, "candidate pair set differs")
    for (((a, b), (cn, jac, ra, pa)) <- got) {
      val common = nbrs(a) & nbrs(b)
      assert(cn == common.size.toLong, s"($a,$b) cn")
      assert(jac == cn * 1000000L / (deg(a) + deg(b) - cn), s"($a,$b) jac")
      assert(ra == common.toSeq.map(w => 1000000L / deg(w)).sum,
        s"($a,$b) ra")
      assert(pa == deg(a) * deg(b), s"($a,$b) pa")
    }
    // scores genuinely discriminate on this corpus
    assert(got.values.map(_._1).toSet.size > 1, "cn is constant")
    assert(got.values.map(_._2).toSet.size > 1, "jaccard is constant")
  }

  test("g16: assortativity equals a driver recompute; non-degenerate; in range") {
    val r = ops.Graph.g16.run(spark, sf).collect()(0)
    val (nE, nV, num, den, micro) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val edges = ops.Graph.projectionEdges(spark, sf)
      .select("s1", "s2").collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (v, os) => v -> os.length.toLong }
    val xs = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m = xs.length.toLong
    val (sxy, sx, sx2) = (xs.map(p => p._1 * p._2).sum,
      xs.map(_._1).sum, xs.map(p => p._1 * p._1).sum)
    assert(nE == edges.length && nV == deg.size)
    assert(num == m * sxy - sx * sx && den == m * sx2 - sx * sx)
    // non-degenerate on this corpus (a regular graph would zero den)
    assert(den > 0, "projection is degree-regular — assortativity vacuous")
    // symmetric-truncation division, and the Pearson range bound
    val expMicro = if (num >= 0) num * 1000000L / den
      else -((-num) * 1000000L / den)
    assert(micro == expMicro)
    assert(micro >= -1000000L && micro <= 1000000L)
    assert((micro >= 0) == (num >= 0), "sign disagrees with the numerator")
  }

  test("g17: modularity equals a driver recompute over g06's own labels") {
    val rows = ops.Graph.g17.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val lab = ops.Graph.g06.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = spark.read
      .parquet(ops.Graph.ensureProjection(spark, sf))
      .select("s1", "s2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = edges.length.toLong
    // conservation laws: communities partition the labelled nodes;
    // degree mass sums to 2m; intra edges can't exceed m
    assert(rows.map(_._2).sum == lab.size)
    assert(rows.map(_._4).sum == 2 * m)
    assert(rows.map(_._3).sum <= m)
    // per-community integers equal a sequential recompute
    val wantIntra = edges.groupBy { case (a, b) =>
      if (lab(a) == lab(b)) Some(lab(a)) else None }
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (v, os) => v -> os.length.toLong }
    val wantDeg = lab.toSeq.groupBy(_._2)
      .map { case (c, vs) => c -> vs.map(p => deg(p._1)).sum }
    rows.foreach { case (c, _, intra, dsum, _, _) =>
      assert(intra == wantIntra.getOrElse(Some(c), Array.empty).length,
        s"community $c intra edges")
      assert(dsum == wantDeg(c), s"community $c degree sum")
    }
    // the global score: constant across rows, equals both the integer
    // formula and (within float re-association) the sum of q_c
    val q = rows.head._6
    assert(rows.forall(_._6 == q))
    val intra = rows.map(_._3).sum
    val degsq = rows.map(r => r._4 * r._4).sum
    assert(q == intra.toDouble / m - degsq.toDouble / (4.0 * m * m))
    assert(math.abs(q - rows.map(_._5).sum) < 1e-9,
      "modularity is not the sum of its per-community terms")
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of range")
    // non-vacuous: edges and intra-community mass exist (at this tiny
    // SF the projection is near-complete, so LPA legitimately finds
    // Q ≈ 0 — the SCORE being honest about that is the point; do not
    // assert structure the corpus doesn't have)
    assert(m > 0 && rows.map(_._3).sum > 0, "no intra-community edges")
  }
}

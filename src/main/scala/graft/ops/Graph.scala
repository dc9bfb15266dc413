package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Graph analytics over relationally-derived edges (north-star [EXT];
  * ref: absent). Complements the dedup tier's connected components
  * (`Dedup.scala` label propagation / large-star small-star): PageRank is
  * the other canonical iterate-until-stable graph dataflow, and at 100 TB
  * it is exactly the d08 shape — per round one join-shuffle on `src` and
  * one agg-shuffle on `dst`, lineage truncated per round, no adjacency
  * materialisation on the driver.
  */
object Graph {

  // ---------------------------------------------------------------- g01
  /** Damped PageRank (d = 0.85, 3 rounds) on the undirected bipartite
    * part–supplier graph induced by lineitem (edge = "this supplier
    * shipped this part", deduplicated). Cross-engine determinism: the
    * per-node neighbour sum is the one float-order hazard, so each
    * contribution `pr/deg` is quantised to the 1e-12 grid
    * (`round(x·1e12)` → BIGINT — both engines round half away from zero)
    * and summed as integers (exact, order-free at any parallelism; the
    * s05/q36 trick), then the new rank is assembled in ONE fixed double
    * expression. Ranks are therefore bit-identical in both engines by
    * induction over rounds. The driver holds only the node count (an
    * O(1) scalar, like d08's fixpoint checks); iteration count is fixed
    * at 3 to match the unrolled oracle — the production driver loop with
    * convergence detection is [[graft.ops.Similarity.kmeansLloyd]]-style
    * and shares this per-round dataflow. */
  val g01 = Q("g01_pagerank", {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n2.node,
         |    0.15 / nn.n + 0.85 * (CAST(coalesce(s.m, 0) AS BIGINT) / 1000000000000.0) AS pr
         |  FROM nodes n2 CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum(CAST(round(r.pr / d.deg * 1000000000000.0) AS BIGINT)) AS m
         |    FROM edges e
         |    JOIN $prev r ON r.node = e.src
         |    JOIN deg d ON d.node = e.src
         |    GROUP BY e.dst) s ON s.node = n2.node)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |edges AS (
       |  SELECT 'p:' || CAST(pk AS VARCHAR) AS src,
       |         's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
       |  UNION ALL
       |  SELECT 's:' || CAST(sk AS VARCHAR),
       |         'p:' || CAST(pk AS VARCHAR) FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |deg AS (
       |  SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg
       |  FROM edges GROUP BY 1),
       |r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, pr FROM r3 ORDER BY node""".stripMargin
  }) { (s, d) =>
    // internal node ids are packed LONGS (part -> 2*pk, supplier ->
    // 2*sk+1): every per-round shuffle/join/agg keys on an 8-byte
    // integer instead of a "p:123" string — the display strings exist
    // only in the final projection, where the oracle's node column is
    // assembled identically
    val pr0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct() // №27 non-case: spread regressed g01/g02 (r16 measured)
    val pNode = col("pk") * 2
    val sNode = col("sk") * 2 + 1
    val edges = pr0.select(pNode.as("src"), sNode.as("dst"))
      .union(pr0.select(sNode.as("src"), pNode.as("dst")))
      .localCheckpoint() // reused every round; truncates the distinct lineage
    // every node of the undirected graph has degree >= 1, so the degree
    // table IS the node set — one aggregation serves both (and is the
    // only other reuse point worth materialising)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint()
    val nodes = deg.select("node")
    val n = deg.count().toDouble // O(1) driver scalar (d08-style)
    var r = nodes.select(col("node"), (lit(1.0) / lit(n)).as("pr"))
    // 3 fixed rounds = a shallow linear plan chain (each round's plan
    // embeds the previous exactly once) — no per-round checkpoint
    // barrier needed; the checkpointed inputs keep it from re-running
    // the distinct. An open-ended convergence loop would checkpoint
    // per round (the d08/s06 discipline).
    for (_ <- 1 to 3)
      r = pageRankRound(edges, deg, nodes, r, n)
    r.select(
      when(col("node") % 2 === 0,
        concat(lit("p:"), expr("CAST(node DIV 2 AS STRING)")))
        .otherwise(concat(lit("s:"), expr("CAST(node DIV 2 AS STRING)")))
        .as("node"),
      col("pr"))
      .orderBy("node")
  }

  /** One PageRank round: quantised contribution agg + rank assembly —
    * exposed so PlanAuditSpec can audit the un-checkpointed round plan
    * (g01's own final plan is lineage-truncated per round). */
  private[graft] def pageRankRound(edges: DataFrame, deg: DataFrame,
      nodes: DataFrame, r: DataFrame, n: Double): DataFrame = {
    val contrib = edges
      .join(r.withColumnRenamed("node", "src"), "src")
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(round(col("pr") / col("sdeg") * lit(1000000000000.0))
        .cast("long")).as("m"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(0.15) / lit(n) + lit(0.85) *
          (coalesce(col("m"), lit(0L)).cast("double") / lit(1000000000000.0)))
          .as("pr"))
  }

  // ---------------------------------------------------------------- g02
  /** Hub cap for [[g02]]: parts touched by more than this many suppliers
    * are excluded from the projection (see docstring). */
  val ProjDegCap = 64L

  /** Bipartite projection — the co-occurrence graph: suppliers connected
    * by the parts they both ship, weight = number of shared parts. The
    * scale hazard is the hub part: projecting part p costs deg(p)²
    * pairs, so Σdeg² explodes on hot parts exactly like d02's shingle
    * fanout — the same df-cap discipline applies: parts above
    * [[ProjDegCap]] suppliers are excluded BEFORE the self-join
    * (deterministic, degree is data not order; the d06 convention —
    * documented precision loss, bounded cost). Weight ≥ 2 keeps only
    * repeated co-occurrence (single shared parts are noise ties at any
    * scale). Plan: one distinct, one degree agg, an equi-self-join on
    * pk, one pair agg — every shuffle keyed, nothing quadratic in
    * |suppliers|. */
  val g02 = Q("g02_coprojection",
    s"""WITH ps AS (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |pdeg AS (SELECT pk, count(*) AS d FROM ps GROUP BY pk),
       |kept AS (
       |  SELECT ps.pk, ps.sk FROM ps JOIN pdeg ON pdeg.pk = ps.pk
       |  WHERE pdeg.d <= $ProjDegCap),
       |pairs AS (
       |  SELECT a.sk AS s1, b.sk AS s2, count(*) AS shared
       |  FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk < b.sk
       |  GROUP BY 1, 2)
       |SELECT s1, s2, CAST(shared AS BIGINT) AS shared_parts
       |FROM pairs WHERE shared >= 2
       |ORDER BY s1, s2""".stripMargin) { (s, d) =>
    val ps = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct() // №27 non-case: spread regressed g01/g02 (r16 measured)
    val pdeg = ps.groupBy("pk").agg(count(lit(1)).as("d"))
    val kept = ps.join(pdeg.filter(col("d") <= ProjDegCap), "pk")
      .select("pk", "sk")
    val a = kept.select(col("pk"), col("sk").as("s1"))
    val b = kept.select(col("pk"), col("sk").as("s2"))
    a.join(b, Seq("pk")).filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).cast("long").as("shared_parts"))
      .filter(col("shared_parts") >= 2)
      .orderBy("s1", "s2")
  }

  /** Per-node strongest-tie budget for [[g03]]'s mutual top-k
    * sparsification (see docstring). */
  val TriTopK = 8

  /** Shared CTE block: g02's capped co-occurrence projection, WITH the
    * shared-part weight, then sparsified to the mutual top-[[TriTopK]]
    * graph: each node ranks its neighbours by (weight DESC, id), an edge
    * survives only if BOTH endpoints rank it inside their budget. The
    * final `e (s1 < s2)` is spliced verbatim into the g03 oracle so the
    * graph under test is definitionally identical cross-engine (the
    * `ps`/`pdeg`/`kept`/`ew` prefix is exactly g02's projection). */
  private[graft] val projEdgeCtes =
    s"""ps AS (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |pdeg AS (SELECT pk, count(*) AS d FROM ps GROUP BY pk),
       |kept AS (
       |  SELECT ps.pk, ps.sk FROM ps JOIN pdeg ON pdeg.pk = ps.pk
       |  WHERE pdeg.d <= $ProjDegCap),
       |ew AS (
       |  SELECT a.sk AS s1, b.sk AS s2, count(*) AS w
       |  FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk < b.sk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |dir AS (
       |  SELECT s1 AS v, s2 AS nb, w FROM ew
       |  UNION ALL SELECT s2 AS v, s1 AS nb, w FROM ew),
       |topk AS (
       |  SELECT v, nb FROM (
       |    SELECT v, nb,
       |      row_number() OVER (PARTITION BY v ORDER BY w DESC, nb) AS rk
       |    FROM dir) r
       |  WHERE rk <= $TriTopK),
       |e AS (
       |  SELECT t1.v AS s1, t1.nb AS s2
       |  FROM topk t1 JOIN topk t2 ON t2.v = t1.nb AND t2.nb = t1.v
       |  WHERE t1.v < t1.nb)""".stripMargin

  // ---------------------------------------------------------------- g03
  /** Triangle counting (per-node participation) — the canonical
    * clustering/community signal — on the MUTUAL TOP-K co-occurrence
    * graph. Two scale disciplines compose here:
    *
    * 1. **Sparsify before counting.** A raw co-occurrence projection
    *    degenerates toward the complete graph as data grows (at sf0.1
    *    every supplier pair already shares ≥2 parts: 499,500 edges, all
    *    degrees 999 — with ~166M triangles the ANSWER is cubic; no
    *    algorithm outruns its own output). Production co-occurrence
    *    analytics therefore keep each node's k strongest ties only
    *    (weight DESC, id tie-break — deterministic), mutual = symmetric:
    *    max degree ≤ [[TriTopK]], m ≤ k·n, wedge work O(n·k²) — linear
    *    in nodes at ANY scale. The ranking is a key-partitioned window
    *    (never single-partition).
    * 2. **Orient, then enumerate.** Wedges enumerate only at each edge's
    *    lower-(deg, id) endpoint (Suri & Vassilvitskii 2011; Schank
    *    2007) and close against the undirected set — out-degree O(√m)
    *    on any graph, so even without the top-k cap the celebrity-node
    *    D² blowup cannot concentrate on one task.
    *
    * Plan: the shared g02 projection, one keyed window, one degree agg,
    * one orientation join, a wedge self-equi-join on `u`, a closing
    * equi-join on (s1, s2) — all keyed shuffles, nothing quadratic in
    * |V|. Every count is an integer; both engines enumerate the
    * identical wedge set. */
  /** Shared CTE block: the oriented-wedge triangle enumeration over `e`,
    * ending in `tc (node, triangles)` — spliced into the g03 AND g04
    * oracles after [[projEdgeCtes]]. */
  private[graft] val triangleCtes =
    """vdeg AS (
      |  SELECT v, count(*) AS d
      |  FROM (SELECT s1 AS v FROM e UNION ALL SELECT s2 AS v FROM e) u
      |  GROUP BY v),
      |o AS (
      |  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.s1 < e.s2)
      |              THEN e.s1 ELSE e.s2 END AS u,
      |         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.s1 < e.s2)
      |              THEN e.s2 ELSE e.s1 END AS w
      |  FROM e JOIN vdeg d1 ON d1.v = e.s1 JOIN vdeg d2 ON d2.v = e.s2),
      |tri AS (
      |  SELECT o1.u AS x, o1.w AS y, o2.w AS z
      |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.w < o2.w
      |  JOIN e ON e.s1 = o1.w AND e.s2 = o2.w),
      |corners AS (
      |  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri),
      |tc AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS triangles
      |  FROM corners GROUP BY node)""".stripMargin

  val g03 = Q("g03_triangles",
    s"""WITH $projEdgeCtes,
       |$triangleCtes
       |SELECT node, triangles FROM tc ORDER BY node""".stripMargin) { (s, d) =>
    // r8 verdict: read the memoised projection ([[ensureProjection]])
    // instead of re-deriving the corpus-scale sparsification live — the
    // artifact IS the live Spark derivation (built once per corpus), and
    // the DuckDB oracle recomputes the projection from lineitem on every
    // run, so the hash match still verifies the sparsification
    // end-to-end cross-engine.
    val e = s.read.parquet(ensureProjection(s, d))
    triangleCounts(e, degreesOf(e)).orderBy("node")
  }

  /** Undirected degree table (v, d) of an (s1, s2) edge set — the one
    * definition both the orientation and g04's coefficient use. */
  private[graft] def degreesOf(e: DataFrame): DataFrame =
    e.select(col("s1").as("v")).union(e.select(col("s2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

  /** Per-node triangle counts over a checkpointed edge set (s1 < s2) —
    * the DataFrame twin of [[triangleCtes]], shared by g03 and g04. The
    * caller supplies the [[degreesOf]] table so g04 reuses ONE degree
    * aggregation for both the orientation and the coefficient (review
    * finding: two independent builds could silently diverge). */
  private[graft] def triangleCounts(e: DataFrame, vdeg: DataFrame): DataFrame = {
    val j = e
      .join(vdeg.select(col("v").as("s1"), col("d").as("d1")), "s1")
      .join(vdeg.select(col("v").as("s2"), col("d").as("d2")), "s2")
    val lower = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("s1") < col("s2"))
    val o = j.select(
      when(lower, col("s1")).otherwise(col("s2")).as("u"),
      when(lower, col("s2")).otherwise(col("s1")).as("w"))
      .localCheckpoint() // self-joined below
    val wedges = o.select(col("u"), col("w").as("y"))
      .join(o.select(col("u"), col("w").as("z")), "u")
      .filter(col("y") < col("z"))
    val tri = wedges.join(e,
      e("s1") === wedges("y") && e("s2") === wedges("z"))
      .select(col("u").as("x"), col("y"), col("z"))
    tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("triangles"))
  }

  // ---------------------------------------------------------------- g04
  /** Local clustering coefficient — closes the triangle story: per node,
    * the fraction of its neighbour pairs that are themselves connected,
    * `2·t / (d·(d-1))` (0 for degree < 2). The community-structure
    * metric every graph-quality report carries; composes g03's triangle
    * counts with the degree table on the SAME sparsified graph (shared
    * CTEs, no drift). Cross-engine determinism: the coefficient is ONE
    * fixed double expression over two exact integers — a single IEEE
    * division, bit-equal in both engines. Cost: g03 + one left join. */
  /** The clustering-coefficient oracle tail over the shared CTEs —
    * g04 states it over the live derivation, g05 over the identical
    * derivation (materialisation must be semantics-invisible). */
  private val clusteringSql: String =
    s"""WITH $projEdgeCtes,
       |$triangleCtes
       |SELECT v.v AS node, CAST(v.d AS BIGINT) AS degree,
       |  CAST(coalesce(tc.triangles, 0) AS BIGINT) AS triangles,
       |  CASE WHEN v.d >= 2
       |       THEN 2.0 * coalesce(tc.triangles, 0) / (v.d * (v.d - 1))
       |       ELSE 0.0 END AS clustering
       |FROM vdeg v LEFT JOIN tc ON tc.node = v.v
       |ORDER BY node""".stripMargin

  /** g04's dataflow over any (s1, s2) edge set — shared with g05 so the
    * live and materialised paths run one definition. */
  private def clusteringSummary(e: DataFrame): DataFrame = {
    val vdeg = degreesOf(e).localCheckpoint() // reused by tc AND the join
    val tc = triangleCounts(e, vdeg).withColumnRenamed("node", "v")
    vdeg.join(tc, Seq("v"), "left")
      .select(col("v").as("node"), col("d").cast("long").as("degree"),
        coalesce(col("triangles"), lit(0L)).cast("long").as("triangles"),
        when(col("d") >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy("node")
  }

  val g04 = Q("g04_clustering_coeff", clusteringSql) { (s, d) =>
    // r8 verdict: like g03, read the memoised artifact rather than pay
    // the projection a second time per run. g05 keeps its distinct role
    // as the plan-audited amortisation entry; the oracle (live DuckDB
    // derivation) remains the cross-engine witness for both.
    clusteringSummary(s.read.parquet(ensureProjection(s, d)))
  }

  // ---------------------------------------------------------------- g05
  /** Per-process scratch root for materialised projections, removed on
    * JVM exit (the in09/warehouse discipline). */
  private lazy val projScratch: String = {
    val dir = s"/tmp/graft-proj-${ProcessHandle.current().pid()}"
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    dir
  }

  private val projLock = new Object

  /** Materialise the sparsified projection ONCE per corpus dir (md5-
    * keyed path, filesystem-memoised — per-process scratch, so no
    * cross-session catalog hazard) and return the artifact path. */
  private[graft] def ensureProjection(s: SparkSession, d: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(12)
      .map(b => f"${b & 0xff}%02x").mkString
    val path = s"$projScratch/$md"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) projLock.synchronized {
      if (!done.exists())
        projectionEdges(s, d).write.mode("overwrite").parquet(path)
    }
    path
  }

  /** The FULL weighted projection `ew (s1 < s2, w ≥ 2)` as a second
    * memoised artifact one level below [[ensureProjection]]'s top-k
    * graph: the pair self-join behind it is the single corpus-scale
    * stage every weighted-graph consumer pays (g12's Borůvka needs the
    * un-sparsified edges, so it can't reuse the top-k artifact) —
    * materialised once, read per query (the g05 amortisation, extended
    * down one derivation level). */
  private[graft] def ensureWeightedEdges(s: SparkSession, d: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(12)
      .map(b => f"${b & 0xff}%02x").mkString
    val path = s"$projScratch/$md-ew"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) projLock.synchronized {
      if (!done.exists()) {
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .distinct()
        val pdeg = ps.groupBy("pk").agg(count(lit(1)).as("d"))
        val kept = ps.join(pdeg.filter(col("d") <= ProjDegCap), "pk")
          .select("pk", "sk")
        kept.select(col("pk"), col("sk").as("s1"))
          .join(kept.select(col("pk"), col("sk").as("s2")), Seq("pk"))
          .filter(col("s1") < col("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
          .write.mode("overwrite").parquet(path)
      }
    }
    path
  }

  /** The amortised graph pipeline (SCALE.md's g02/g03/g04 note made
    * executable): the co-occurrence projection — the only corpus-scale
    * stage in the graph family — is materialised ONCE per corpus dir
    * ([[ensureProjection]], the q44 one-time-write pattern), and the
    * full per-node summary (degree, triangles, clustering) is computed
    * from the ARTIFACT: every stage after the write is edge-table-sized.
    * The oracle is g04's, verbatim — the hash compare proves
    * materialisation is semantics-invisible, and `PlanAuditSpec` pins
    * the physical claim: g05's plan contains NO lineitem scan, only the
    * artifact read. Bench reps 2+ measure what a deployment pays after
    * the nightly projection build. */
  val g05 = Q("g05_materialized_graph", clusteringSql) { (s, d) =>
    clusteringSummary(s.read.parquet(ensureProjection(s, d)))
  }

  /** The mutual top-[[TriTopK]] sparsified projection as a reusable edge
    * set (s1 < s2) — the DataFrame twin of [[projEdgeCtes]]: g02's
    * weighted pairs, per-node (weight DESC, id) ranking via a
    * key-partitioned window, and the mutuality self-join. */
  private[graft] def projectionEdges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct() // №27 non-case: spread regressed g01/g02 (r16 measured)
    val pdeg = ps.groupBy("pk").agg(count(lit(1)).as("d"))
    val kept = ps.join(pdeg.filter(col("d") <= ProjDegCap), "pk")
      .select("pk", "sk")
    val ew = kept.select(col("pk"), col("sk").as("s1"))
      .join(kept.select(col("pk"), col("sk").as("s2")), Seq("pk"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
    val dir = ew.select(col("s1").as("v"), col("s2").as("nb"), col("w"))
      .union(ew.select(col("s2").as("v"), col("s1").as("nb"), col("w")))
    val topk = dir
      .withColumn("rk", row_number().over(
        Window.partitionBy("v").orderBy(col("w").desc, col("nb"))))
      .filter(col("rk") <= TriTopK)
      .select("v", "nb")
    topk.as("t1")
      .join(topk.as("t2"),
        col("t2.v") === col("t1.nb") && col("t2.nb") === col("t1.v"))
      .filter(col("t1.v") < col("t1.nb"))
      .select(col("t1.v").as("s1"), col("t1.nb").as("s2"))
  }

  // ---------------------------------------------------------------- g06
  /** Community detection via label propagation (Raghavan et al. 2007) —
    * the third graph-structure pass (after triangles/clustering) a
    * corpus graph pipeline runs: assign every node its own label, then
    * repeatedly adopt the MAJORITY label among neighbours; connected
    * regions converge to shared labels = communities. Production LPA is
    * usually asynchronous (update order changes answers — useless for a
    * reproducible pipeline), so this is the SYNCHRONOUS variant with a
    * total deterministic vote order: per node, `(vote count DESC, label
    * ASC)` — both engines elect identical labels at every round.
    *
    * Two rounds unrolled (s06's iterative-oracle pattern; g01's round
    * function discipline): round 1 degenerates to min-neighbour-id
    * (every neighbour votes its own id, all counts 1, tie-break takes
    * the min — `GraphSpec` pins that closed form independently), round 2
    * is the first genuine majority vote. At deployment the same round
    * function iterates to fixpoint exactly like g01's pagerank loop.
    *
    * Scale: each round is one keyed equi-join (labels onto the directed
    * edge list), one (v, label) hash agg with map-side combine, and one
    * per-key window — O(m) work per round, max degree ≤ [[TriTopK]] by
    * the mutual-top-k sparsification, no global structure anywhere.
    * Runs over g05's materialised artifact (the amortisation pattern:
    * graph passes after the first read edge-table-sized inputs). */
  val g06 = Q("g06_label_propagation",
    s"""WITH $projEdgeCtes,
       |dirx AS (
       |  SELECT s1 AS v, s2 AS nb FROM e
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM e),
       |l1 AS (
       |  SELECT v, lbl FROM (
       |    SELECT v, lbl,
       |      row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rk
       |    FROM (SELECT v, nb AS lbl, count(*) AS c
       |          FROM dirx GROUP BY 1, 2) v1) r1
       |  WHERE rk = 1),
       |v2 AS (
       |  SELECT d.v, l.lbl, count(*) AS c
       |  FROM dirx d JOIN l1 l ON l.v = d.nb
       |  GROUP BY 1, 2),
       |l2 AS (
       |  SELECT v, lbl FROM (
       |    SELECT v, lbl,
       |      row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rk
       |    FROM v2) r2
       |  WHERE rk = 1),
       |sizes AS (
       |  SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
       |  FROM l2 GROUP BY lbl)
       |SELECT l2.v AS node, l2.lbl AS label, sizes.community_size
       |FROM l2 JOIN sizes USING (lbl)
       |ORDER BY node""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = s.read.parquet(ensureProjection(s, d))
    val dirx = e.select(col("s1").as("v"), col("s2").as("nb"))
      .union(e.select(col("s2").as("v"), col("s1").as("nb")))
      .localCheckpoint() // reused by both rounds
    // one synchronous vote round: labels arrive at each node through the
    // directed edge list, majority elects, ties to the smallest label
    def lpaRound(labels: DataFrame): DataFrame =
      dirx.join(labels.withColumnRenamed("v", "nb"), "nb")
        .groupBy("v", "lbl").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("v").orderBy(col("c").desc, col("lbl"))))
        .filter(col("rk") === 1)
        .select("v", "lbl")
    val l0 = dirx.select(col("v")).distinct().withColumn("lbl", col("v"))
    val l2 = lpaRound(lpaRound(l0))
    val sizes = l2.groupBy("lbl")
      .agg(count(lit(1)).cast("long").as("community_size"))
    l2.join(sizes, "lbl")
      .select(col("v").as("node"), col("lbl").as("label"),
        col("community_size"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- g07
  /** Feature offset binding the floor-division semantics: supplier
    * balances can be negative, where DuckDB's `//` floors and Spark's
    * `div` truncates toward zero — shifting every feature into cents +
    * 1e5 (non-negative by the TPC-H balance domain, require'd in-query)
    * makes the two identical. Means in the shifted space are the
    * shifted means exactly (each of the d+1 averaged terms carries the
    * same offset), so nothing is lost. */
  val GnnFeatOffset = 100000L

  /** GNN-style neighbour feature aggregation (the GraphSAGE-mean layer,
    * Hamilton et al. 2017) — the pass that turns a graph + node features
    * into training inputs for graph ML, and the fourth graph-dataflow
    * shape next to iterate-to-fixpoint (g01/g06), enumerate-local-
    * structure (g03/g04), and project (g02): PROPAGATE features along
    * edges and reduce per destination. Two mean layers over the mutual
    * top-[[TriTopK]] projection with the node's supplier balance (exact
    * offset cents, [[GnnFeatOffset]]) as the input feature:
    * `h1(v) = ⌊(c0(v) + Σ_nb c0(nb)) / (deg(v)+1)⌋`, and h2 the same
    * recurrence over h1 — the self-inclusive integer-mean aggregator,
    * so every layer is exact integer arithmetic and both engines agree
    * bit for bit (no quantisation step needed anywhere).
    *
    * Scale shape: each layer is ONE equi join of the feature table onto
    * the directed edge list + ONE dst-keyed hash agg with map-side
    * combine — O(m) per layer, the textbook message-passing plan every
    * distributed GNN system lowers to; max degree ≤ [[TriTopK]] by the
    * mutual-top-k sparsification, so no celebrity-node reducer exists.
    * Runs over g05's materialised artifact (post-projection stages are
    * edge-table-sized; the corpus is never rescanned). */
  val g07 = Q("g07_neighbor_agg",
    s"""WITH $projEdgeCtes,
       |dirx AS (
       |  SELECT s1 AS v, s2 AS nb FROM e
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM e),
       |vdeg2 AS (SELECT v, count(*) AS d FROM dirx GROUP BY v),
       |feat AS (
       |  SELECT vdeg2.v, vdeg2.d,
       |    CAST(round(s.s_acctbal * 100) AS BIGINT) + $GnnFeatOffset AS c0
       |  FROM vdeg2 JOIN supplier s ON s.s_suppkey = vdeg2.v),
       |l1 AS (
       |  SELECT f.v, (f.c0 + sum(fn.c0)) // (f.d + 1) AS h1
       |  FROM dirx dx JOIN feat f ON f.v = dx.v
       |  JOIN feat fn ON fn.v = dx.nb
       |  GROUP BY f.v, f.c0, f.d),
       |l2 AS (
       |  SELECT f.v, (l.h1 + sum(ln.h1)) // (f.d + 1) AS h2
       |  FROM dirx dx JOIN feat f ON f.v = dx.v
       |  JOIN l1 l ON l.v = dx.v
       |  JOIN l1 ln ON ln.v = dx.nb
       |  GROUP BY f.v, l.h1, f.d)
       |SELECT f.v AS node, CAST(f.d AS BIGINT) AS degree,
       |  CAST(f.c0 AS BIGINT) AS c0, CAST(l1.h1 AS BIGINT) AS h1,
       |  CAST(l2.h2 AS BIGINT) AS h2
       |FROM feat f JOIN l1 ON l1.v = f.v JOIN l2 ON l2.v = f.v
       |ORDER BY node""".stripMargin) { (s, d) =>
    val e = s.read.parquet(ensureProjection(s, d))
    val dirx = e.select(col("s1").as("v"), col("s2").as("nb"))
      .union(e.select(col("s2").as("v"), col("s1").as("nb")))
      .localCheckpoint() // reused by both layers
    val vdeg = dirx.groupBy("v").agg(count(lit(1)).as("d"))
    val feat = vdeg.join(
      Tables.supplier(s, d).select(col("s_suppkey").as("v"),
        (expr("CAST(round(s_acctbal * 100) AS BIGINT)") + GnnFeatOffset)
          .as("c0")), "v")
      .localCheckpoint() // reused by layer 1 (both join sides) + output
    require(feat.agg(min("c0")).head.getLong(0) >= 0L,
      "offset features must be non-negative (floor == truncate)")
    // one mean layer: features travel the directed edges, reduce at dst
    def layer(h: DataFrame, hcol: String, out: String): DataFrame =
      dirx.join(h.withColumnRenamed("v", "nb")
          .withColumnRenamed(hcol, "__m"), "nb")
        .groupBy("v").agg(sum("__m").as("__s"))
        .join(h.select(col("v"), col(hcol).as("__self")), "v")
        .join(vdeg, "v")
        .select(col("v"),
          expr(s"(__self + __s) div (d + 1)").as(out))
    val l1 = layer(feat.select("v", "c0"), "c0", "h1").localCheckpoint()
    val l2 = layer(l1, "h1", "h2")
    feat.join(l1, "v").join(l2, "v")
      .select(col("v").as("node"), col("d").cast("long").as("degree"),
        col("c0").cast("long"), col("h1").cast("long"),
        col("h2").cast("long"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- g08
  /** The core order demanded (k) and the number of unrolled peel
    * rounds. */
  val CoreK = 3
  val CoreRounds = 3

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * distributed form is Montresor et al. 2013's message-passing peel)
    * — the graph-dataflow shape none of g01–g07 exercises: iterate by
    * REMOVING nodes (degree < k) and recomputing degrees on the shrunk
    * edge set, where PageRank/LPA iterate values over a FIXED edge set.
    * The k-core is where community cores, spam rings, and robustly-
    * connected subgraphs live — degree alone (g04's input) overcounts:
    * a star centre has huge degree and no core. [[CoreRounds]] rounds
    * unrolled (the g01/g06 convention — the deployment driver iterates
    * the same round function to the empty-removal fixpoint); each round
    * is one semi-join of the edge set against the survivor set + one
    * degree agg — O(m) a round, monotonically SHRINKING m, lineage cut
    * per round. Output: every projection node, its final degree, its
    * per-round survival flags, and the fixpoint verdict for this
    * corpus. Runs over g05's materialised artifact. */
  val g08 = Q("g08_kcore",
    s"""WITH $projEdgeCtes,
       |dirx AS (
       |  SELECT s1 AS v, s2 AS nb FROM e
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM e),
       |d0 AS (SELECT v, count(*) AS deg FROM dirx GROUP BY v),
       |s1x AS (SELECT v FROM d0 WHERE deg >= $CoreK),
       |e1 AS (
       |  SELECT dx.v, dx.nb FROM dirx dx
       |  JOIN s1x a ON a.v = dx.v JOIN s1x b ON b.v = dx.nb),
       |d1 AS (SELECT v, count(*) AS deg FROM e1 GROUP BY v),
       |s2x AS (SELECT v FROM d1 WHERE deg >= $CoreK),
       |e2 AS (
       |  SELECT dx.v, dx.nb FROM e1 dx
       |  JOIN s2x a ON a.v = dx.v JOIN s2x b ON b.v = dx.nb),
       |d2 AS (SELECT v, count(*) AS deg FROM e2 GROUP BY v),
       |s3x AS (SELECT v FROM d2 WHERE deg >= $CoreK),
       |e3 AS (
       |  SELECT dx.v, dx.nb FROM e2 dx
       |  JOIN s3x a ON a.v = dx.v JOIN s3x b ON b.v = dx.nb),
       |d3 AS (SELECT v, count(*) AS deg FROM e3 GROUP BY v)
       |SELECT d0.v AS node, CAST(d0.deg AS BIGINT) AS degree,
       |  s1x.v IS NOT NULL AS in_r1, s2x.v IS NOT NULL AS in_r2,
       |  s3x.v IS NOT NULL AND coalesce(d3.deg, 0) >= $CoreK AS in_core,
       |  CAST(coalesce(d3.deg, 0) AS BIGINT) AS core_degree
       |FROM d0
       |LEFT JOIN s1x ON s1x.v = d0.v
       |LEFT JOIN s2x ON s2x.v = d0.v
       |LEFT JOIN s3x ON s3x.v = d0.v
       |LEFT JOIN d3 ON d3.v = d0.v
       |ORDER BY node""".stripMargin) { (s, d) =>
    val e0 = s.read.parquet(ensureProjection(s, d))
    val dirx = e0.select(col("s1").as("v"), col("s2").as("nb"))
      .union(e0.select(col("s2").as("v"), col("s1").as("nb")))
      .localCheckpoint()
    def degrees(edges: DataFrame): DataFrame =
      edges.groupBy("v").agg(count(lit(1)).as("deg"))
    // one peel round: survivors = deg >= k; keep edges whose BOTH
    // endpoints survive (two semi-joins on the shrinking survivor set)
    def peel(edges: DataFrame): (DataFrame, DataFrame) = {
      val surv = degrees(edges).filter(col("deg") >= CoreK).select("v")
        .localCheckpoint() // reused by both endpoint joins
      val kept = edges
        .join(surv, "v")
        .join(surv.withColumnRenamed("v", "nb"), "nb")
        .select("v", "nb")
        .localCheckpoint() // next round's input; cuts the peel lineage
      (surv, kept)
    }
    val d0 = degrees(dirx).localCheckpoint()
    val (s1, e1) = peel(dirx)
    val (s2, e2) = peel(e1)
    val (s3, e3) = peel(e2)
    val d3 = degrees(e3)
    d0.select(col("v"), col("deg"))
      .join(s1.withColumn("r1", lit(true)), Seq("v"), "left")
      .join(s2.withColumn("r2", lit(true)), Seq("v"), "left")
      .join(s3.withColumn("r3", lit(true)), Seq("v"), "left")
      .join(d3.withColumnRenamed("deg", "deg3"), Seq("v"), "left")
      .select(col("v").as("node"), col("deg").cast("long").as("degree"),
        coalesce(col("r1"), lit(false)).as("in_r1"),
        coalesce(col("r2"), lit(false)).as("in_r2"),
        (coalesce(col("r3"), lit(false)) &&
          coalesce(col("deg3"), lit(0L)) >= CoreK).as("in_core"),
        coalesce(col("deg3"), lit(0L)).cast("long").as("core_degree"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- g09
  /** Multi-source BFS hop distances — the graph-TRAVERSAL dataflow
    * (frontier relaxation on the min-plus semiring) that none of g01–g08
    * exercises: g01 iterates weighted sums, g06 majority votes, g08
    * removes nodes; BFS propagates `dist(v) = min(dist(v),
    * min_nb dist(nb)+1)` from a seed set outward, the primitive under
    * reachability, influence radius, and "how far is every supplier from
    * the anchor set" questions.
    *
    * Seeds are the deterministic congruence class `v % 19 = 0` within the
    * projection's node set (non-empty at every SF; data-derived, never
    * `rand()`). Three relaxation rounds unrolled — the s06/g06 oracle
    * discipline — so the DuckDB twin is three plain min-joins; at
    * deployment the SAME round function iterates to fixpoint like g01's
    * loop, with rounds = eccentricity of the seed set. Unreached nodes
    * carry no row (a LEFT join + sentinel would claim knowledge the
    * 3-round horizon doesn't have).
    *
    * Scale: each round is one equi-join of the current distance table
    * onto the edge list + one min-agg with map-side combine — O(m) per
    * round; `localCheckpoint` cuts lineage so round N never replays
    * rounds 1..N−1 (the d08 discipline). Distance state is 2 integers
    * per reached node — the frontier never materialises neighborhoods. */
  val g09 = Q("g09_bfs_hops",
    s"""WITH $projEdgeCtes,
       |dirx AS (
       |  SELECT s1 AS v, s2 AS nb FROM e
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM e),
       |nodes AS (SELECT DISTINCT v FROM dirx),
       |d0 AS (SELECT v, 0 AS dist FROM nodes WHERE v % 19 = 0),
       |d1 AS (
       |  SELECT v, min(dist) AS dist FROM (
       |    SELECT v, dist FROM d0
       |    UNION ALL
       |    SELECT dirx.v, d0.dist + 1 FROM dirx JOIN d0 ON d0.v = dirx.nb) u1
       |  GROUP BY v),
       |d2 AS (
       |  SELECT v, min(dist) AS dist FROM (
       |    SELECT v, dist FROM d1
       |    UNION ALL
       |    SELECT dirx.v, d1.dist + 1 FROM dirx JOIN d1 ON d1.v = dirx.nb) u2
       |  GROUP BY v),
       |d3 AS (
       |  SELECT v, min(dist) AS dist FROM (
       |    SELECT v, dist FROM d2
       |    UNION ALL
       |    SELECT dirx.v, d2.dist + 1 FROM dirx JOIN d2 ON d2.v = dirx.nb) u3
       |  GROUP BY v)
       |SELECT v AS node, CAST(dist AS BIGINT) AS hops
       |FROM d3 ORDER BY node""".stripMargin) { (s, d) =>
    val e0 = s.read.parquet(ensureProjection(s, d))
    val dirx = e0.select(col("s1").as("v"), col("s2").as("nb"))
      .union(e0.select(col("s2").as("v"), col("s1").as("nb")))
      .localCheckpoint()
    var dist = dirx.select("v").distinct()
      .filter(col("v") % 19 === 0)
      .select(col("v"), lit(0).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      dist = dist
        .union(dirx.join(dist.withColumnRenamed("v", "nb"), "nb")
          .select(col("v"), (col("dist") + 1).as("dist")))
        .groupBy("v").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist.select(col("v").as("node"), col("dist").cast("long").as("hops"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- g10
  /** Personalized PageRank (random walk with restart, Jeh & Widom 2002)
    * — g01's global teleport replaced by restart to a SEED set: rank
    * becomes proximity TO THE SEEDS, the recommendation / related-items
    * measure a global PageRank cannot express (g01 answers "important
    * overall", this answers "important relative to these suppliers").
    * Seeds are the supplier nodes `sk % 19 = 0` (g09's congruence-class
    * discipline) on the same bipartite part–supplier graph.
    *
    * Same per-round dataflow and 1e-12 integer quantisation as g01 —
    * contributions round to the grid, sum as order-free integers, the
    * new rank assembles in ONE fixed double expression whose teleport
    * term is `0.15·[v ∈ S]/|S|` — so ranks stay bit-identical
    * cross-engine by the same induction. r₀ concentrates all mass on
    * the seeds (the restart distribution), 3 rounds unrolled to match
    * the oracle. Scale: identical to g01 — one contrib join + one agg
    * per round, plus a broadcast seed-indicator join. */
  val g10 = Q("g10_personalized_pagerank", {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n2.node,
         |    0.15 * (CASE WHEN n2.node IN (SELECT node FROM seeds)
         |                 THEN 1.0 / ns.n ELSE 0.0 END)
         |    + 0.85 * (CAST(coalesce(s.m, 0) AS BIGINT) / 1000000000000.0) AS pr
         |  FROM nodes n2 CROSS JOIN ns
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum(CAST(round(r.pr / d.deg * 1000000000000.0) AS BIGINT)) AS m
         |    FROM edges e
         |    JOIN $prev r ON r.node = e.src
         |    JOIN deg d ON d.node = e.src
         |    GROUP BY e.dst) s ON s.node = n2.node)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |edges AS (
       |  SELECT 'p:' || CAST(pk AS VARCHAR) AS src,
       |         's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
       |  UNION ALL
       |  SELECT 's:' || CAST(sk AS VARCHAR),
       |         'p:' || CAST(pk AS VARCHAR) FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |seeds AS (
       |  SELECT DISTINCT 's:' || CAST(sk AS VARCHAR) AS node FROM pairs
       |  WHERE sk % 19 = 0),
       |ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
       |deg AS (
       |  SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg
       |  FROM edges GROUP BY 1),
       |r0 AS (
       |  SELECT node,
       |    CASE WHEN node IN (SELECT node FROM seeds)
       |         THEN 1.0 / ns.n ELSE 0.0 END AS pr
       |  FROM nodes CROSS JOIN ns),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, pr FROM r3 WHERE pr > 0 ORDER BY node""".stripMargin
  }) { (s, d) =>
    val pr0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct() // №27 non-case: spread regressed g01/g02 (r16 measured)
    val pNode = col("pk") * 2
    val sNode = col("sk") * 2 + 1
    val edges = pr0.select(pNode.as("src"), sNode.as("dst"))
      .union(pr0.select(sNode.as("src"), pNode.as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint()
    val nodes = deg.select("node")
    val seeds = pr0.filter(col("sk") % 19 === 0)
      .select((col("sk") * 2 + 1).as("node")).distinct()
      .withColumn("is_seed", lit(1.0))
      .localCheckpoint() // joined every round
    val nSeeds = seeds.count().toDouble // O(1) driver scalar (g01 rule)
    var r = nodes.join(seeds, Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("is_seed"), lit(0.0)) / lit(nSeeds)).as("pr"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(deg.withColumnRenamed("node", "src")
          .withColumnRenamed("deg", "sdeg"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(round(col("pr") / col("sdeg") * lit(1000000000000.0))
          .cast("long")).as("m"))
      r = nodes.join(contrib, Seq("node"), "left")
        .join(seeds, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) * (coalesce(col("is_seed"), lit(0.0)) / lit(nSeeds)) +
            lit(0.85) * (coalesce(col("m"), lit(0L)).cast("double") /
              lit(1000000000000.0))).as("pr"))
    }
    r.filter(col("pr") > 0)
      .select(
        when(col("node") % 2 === 0,
          concat(lit("p:"), expr("CAST(node DIV 2 AS STRING)")))
          .otherwise(concat(lit("s:"), expr("CAST(node DIV 2 AS STRING)")))
          .as("node"),
        col("pr"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- g11
  /** 2^53 — the rho=0 scale of the q10c register arithmetic (W=13). */
  private val AnfShift = 9007199254740992L
  /** Linear-counting table in micro units: lc[v] = round(16·ln(16/v)·1e6)
    * for v = 1..16 empty registers — ln PRE-EVALUATED into 16 integer
    * literals shared by both engines (ml06 rejected runtime `ln` as only
    * faithfully rounded; a literal table has no rounding at all). */
  private val AnfLcMicro: IndexedSeq[Long] = (1 to 16).map(v =>
    math.round(16.0 * math.log(16.0 / v) * 1e6))

  /** Neighborhood function via HLL sketches (HyperANF — Boldi, Rosa &
    * Vigna 2011): for every node of the g01 bipartite part–supplier
    * graph, an estimate of |ball(v, r)| — the count of distinct nodes
    * within ≤ r hops — for r = 0, 1, 2, from a PER-NODE HLL register
    * vector iterated by max-merge over edges. The sketch×graph
    * composition that makes reach/centrality computable at 100 TB:
    * exact per-node reach needs |V|-bit frontiers per node (quadratic
    * state), while HLL state is m=16 registers per node and the merge
    * is an order-free `max` — one edge join + one (node, reg) hash agg
    * per round, the d08/g01 dataflow exactly.
    *
    * Determinism end-to-end: registers derive from md5 of the node NAME
    * (q10c's register/rho arithmetic, W=13), max-merge is exact, and
    * the estimator is integer fixed-point — q10c's raw-HLL quotient in
    * micro units, switched to linear counting (Whang et al. 1990,
    * `m·ln(m/V)` for V empty registers) below the standard 2.5m
    * small-range threshold, with the ln values pre-evaluated into a
    * 16-entry integer literal table ([[AnfLcMicro]]) so no runtime
    * transcendental ever runs: both engines emit identical BIGINTs at
    * every (node, r). Registers grow monotonically, so sketch state is
    * bounded and merges are idempotent (re-delivery-safe — the property
    * streaming/incremental maintenance needs). Estimates at m=16 carry
    * ~26% standard error by design — the spec pins the REGISTERS to an
    * exact BFS-ball recompute (a deterministic law) and only sanity-
    * bands the estimates against exact reach. */
  /** Shared oracle CTE block for the HyperANF family: the bipartite
    * graph, the md5 register derivation, two max-merge rounds, and the
    * estimator tables `e0`/`e1`/`e2 (node, r, occupied, est_micro)` —
    * g11 states the neighborhood function over it, g13 the harmonic
    * centrality, so both engines' sketch arithmetic has exactly one
    * definition. */
  private lazy val anfOracleCtes: String = {
    val lcList = AnfLcMicro.mkString("[", ", ", "]")
    def est(prev: String, r: Int): String =
      s"""s$r AS (
         |  SELECT node, count(*) AS occupied,
         |    sum((CAST(1 AS BIGINT) << (53 - rho))) AS occ_denom
         |  FROM $prev GROUP BY node),
         |e$r AS (
         |  SELECT node, $r AS r, CAST(occupied AS BIGINT) AS occupied,
         |    CASE WHEN occupied < 16 AND raw <= 40000000
         |         THEN ($lcList)[16 - occupied] ELSE raw END AS est_micro
         |  FROM (
         |    SELECT node, occupied,
         |      CAST(least((CAST(673000 AS HUGEINT) * 256 * $AnfShift) //
         |        (CAST(occ_denom AS HUGEINT) +
         |         (16 - occupied) * CAST($AnfShift AS HUGEINT)),
         |        CAST(1000000000000000 AS HUGEINT)) AS BIGINT) AS raw
         |    FROM s$r))""".stripMargin
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT node, reg, max(rho) AS rho FROM (
         |    SELECT node, reg, rho FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS node, p.reg, p.rho
         |    FROM edges e JOIN $prev p ON p.node = e.src) u
         |  GROUP BY node, reg)""".stripMargin
    s"""pairs AS (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |edges AS (
       |  SELECT 'p:' || CAST(pk AS VARCHAR) AS src,
       |         's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
       |  UNION ALL
       |  SELECT 's:' || CAST(sk AS VARCHAR),
       |         'p:' || CAST(pk AS VARCHAR) FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (
       |  SELECT node,
       |    CAST(CAST('0x' || substr(md5(node), 1, 1) AS BIGINT) AS INT)
       |      AS reg,
       |    CAST(CASE WHEN t = '' THEN 53
       |         ELSE (13 - len(t)) * 4
       |           + CASE WHEN substr(t, 1, 1) = '1' THEN 3
       |                  WHEN substr(t, 1, 1) IN ('2', '3') THEN 2
       |                  WHEN substr(t, 1, 1) IN ('4', '5', '6', '7') THEN 1
       |                  ELSE 0 END + 1 END AS INT) AS rho
       |  FROM (SELECT node, ltrim(substr(md5(node), 2, 13), '0') AS t
       |        FROM nodes)),
       |${round("r0", "r1")},
       |${round("r1", "r2")},
       |${est("r0", 0)},
       |${est("r1", 1)},
       |${est("r2", 2)}""".stripMargin
  }

  /** Materialise the HyperANF register states ONCE per corpus dir (the
    * [[ensureProjection]] amortisation, extended to the sketch tier —
    * the three max-merge rounds are the only corpus-scale stages in the
    * ANF family, and both g11 and g13 consume the same states). Returns
    * (statesPath, namesPath): states = (nid, r, reg, rho) for r = 0..2
    * on packed integer ids; names = (nid, node). */
  private[graft] def ensureAnfStates(s: SparkSession, d: String)
      : (String, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(12)
      .map(b => f"${b & 0xff}%02x").mkString
    val stPath = s"$projScratch/$md-anf-states"
    val nmPath = s"$projScratch/$md-anf-names"
    val done = new java.io.File(s"$stPath/_SUCCESS")
    if (!done.exists()) projLock.synchronized {
      if (!done.exists()) {
        val pr0 = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .distinct()
        // r9 perf: every shuffle (edge join, (node, reg) max-merge agg)
        // keys on packed integer ids (parts even, suppliers odd); the
        // name — still the source of the md5 register derivation and
        // the output contract — lives in its own artifact and is joined
        // back once, on estimate-sized rows. Register values are md5 of
        // the NAME, so the oracle is untouched.
        val pid = expr("pk * 2")
        val sid = expr("sk * 2 + 1")
        val edges = pr0.select(pid.as("src"), sid.as("dst"))
          .union(pr0.select(sid.as("src"), pid.as("dst")))
          .localCheckpoint()
        val names = edges.select(col("src").as("nid")).distinct()
          .select(col("nid"),
            when(pmod(col("nid"), lit(2)) === 0,
              concat(lit("p:"), expr("nid DIV 2").cast("string")))
              .otherwise(concat(lit("s:"), expr("nid DIV 2").cast("string")))
              .as("node"))
          .localCheckpoint()
        names.write.mode("overwrite").parquet(nmPath)
        val h = md5(col("node"))
        val t = ltrim(substring(h, 2, 13), "0")
        val d1 = substring(t, 1, 1)
        val extra = when(d1 === "1", 3)
          .when(d1.isin("2", "3"), 2)
          .when(d1.isin("4", "5", "6", "7"), 1)
          .otherwise(0)
        var st = names
          .select(col("nid"),
            conv(substring(h, 1, 1), 16, 10).cast("int").as("reg"),
            when(length(t) === 0, lit(53))
              .otherwise((lit(13) - length(t)) * 4 + extra + 1)
              .cast("int").as("rho"))
          .localCheckpoint()
        var all = st.withColumn("r", lit(0))
        for (r <- 1 to 2) {
          st = st
            .union(edges.join(st.withColumnRenamed("nid", "src"), "src")
              .select(col("dst").as("nid"), col("reg"), col("rho")))
            .groupBy("nid", "reg").agg(max("rho").cast("int").as("rho"))
            .localCheckpoint()
          all = all.union(st.withColumn("r", lit(r)))
        }
        all.write.mode("overwrite").parquet(stPath)
      }
    }
    (stPath, nmPath)
  }

  /** The integer HLL estimate per node over one round's register rows —
    * the DataFrame twin of the oracle's `e{r}` CTE. */
  private def anfEst(state: DataFrame, r: Int): DataFrame = {
    val lcList = AnfLcMicro.mkString("array(", "L, ", "L)")
    state.groupBy("nid")
      .agg(count(lit(1)).as("occupied"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)")).as("occ_denom"))
      .select(col("nid"), lit(r).as("r"),
        col("occupied").cast("long").as("occupied"),
        expr(s"""CAST(least((CAST(673000 AS DECIMAL(38,0)) * 256 * $AnfShift)
          | div (CAST(occ_denom AS DECIMAL(38,0)) +
          |   (16 - occupied) * CAST($AnfShift AS DECIMAL(38,0))),
          | CAST(1000000000000000 AS DECIMAL(38,0))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("raw"))
      .select(col("nid"), col("r"), col("occupied"),
        when(col("occupied") < 16 && col("raw") <= 40000000L,
          expr(s"element_at($lcList, CAST(16 - occupied AS INT))"))
          .otherwise(col("raw")).as("est_micro"))
  }

  val g11 = Q("g11_neighborhood_function",
    s"""WITH $anfOracleCtes
       |SELECT * FROM (
       |  SELECT * FROM e0 UNION ALL SELECT * FROM e1
       |  UNION ALL SELECT * FROM e2)
       |ORDER BY node, r""".stripMargin) { (s, d) =>
    val (stPath, nmPath) = ensureAnfStates(s, d)
    val states = s.read.parquet(stPath)
    val names = s.read.parquet(nmPath)
    (0 to 2).map(r => anfEst(states.filter(col("r") === r).drop("r"), r))
      .reduce(_ union _)
      .join(names, "nid")
      .select(col("node"), col("r"), col("occupied"), col("est_micro"))
      .orderBy("node", "r")
  }

  // ---------------------------------------------------------------- g13
  /** Harmonic centrality from the HyperANF sketches (Boldi & Vigna,
    * "Axioms for Centrality" 2014) — the PAYOFF of g11's neighborhood
    * function: `H(v) = Σ_{r≥1} (|ball(v,r)| − |ball(v,r−1)|) / r`, the
    * centrality that handles disconnected graphs (unreachable nodes
    * contribute 0, where closeness degenerates) and is exactly what
    * HyperANF was built to make computable at scale — per node, per
    * radius, one sketch-difference, never a per-node BFS. Truncated at
    * the g11 horizon r ≤ 2 (the remaining terms need more rounds, not
    * a different dataflow).
    *
    * Ball-size DIFFERENCES inherit the estimator's noise, so each term
    * is clamped at 0 before the division (the standard HyperANF
    * monotonisation: the true neighborhood function is monotone by
    * definition; a negative estimated increment is pure sketch error).
    * Clamped operands are non-negative → Spark `DIV` == DuckDB `//`
    * (the q51 agreement) and the whole column is exact integer micro
    * units. Scale: both g11 and g13 read the memoised register states
    * ([[ensureAnfStates]] — the g05 amortisation extended to the
    * sketch tier), so the marginal cost of centrality over the
    * neighborhood function is three node-keyed aggs + two node-keyed
    * joins, nothing corpus-scale. */
  val g13 = Q("g13_harmonic_centrality",
    s"""WITH $anfOracleCtes
       |SELECT e0.node,
       |  e0.est_micro AS ball0,
       |  e1.est_micro AS ball1,
       |  e2.est_micro AS ball2,
       |  CAST(greatest(e1.est_micro - e0.est_micro, 0)
       |     + greatest(e2.est_micro - e1.est_micro, 0) // 2
       |       AS BIGINT) AS harmonic_micro
       |FROM e0
       |JOIN e1 ON e1.node = e0.node
       |JOIN e2 ON e2.node = e0.node
       |ORDER BY e0.node""".stripMargin) { (s, d) =>
    val (stPath, nmPath) = ensureAnfStates(s, d)
    val states = s.read.parquet(stPath)
    val names = s.read.parquet(nmPath)
    def ball(r: Int) =
      anfEst(states.filter(col("r") === r).drop("r"), r)
        .select(col("nid"), col("est_micro").as(s"ball$r"))
    ball(0).join(ball(1), "nid").join(ball(2), "nid")
      .join(names, "nid")
      .select(col("node"), col("ball0"), col("ball1"), col("ball2"),
        (greatest(col("ball1") - col("ball0"), lit(0L)) +
          expr("greatest(ball2 - ball1, 0L) DIV 2"))
          .cast("long").as("harmonic_micro"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- g12
  /** Maximum spanning forest via Borůvka rounds (Borůvka 1926; the
    * MST-in-MapReduce dataflow of Lattanzi et al. 2011) — the
    * COMPONENT-MERGE iteration no other graph op exercises: g01/g10
    * iterate values over fixed nodes, g06 labels, g08 removes nodes,
    * d08/d10 merge by direct edges — Borůvka merges by each
    * component's single BEST incident edge, halving component count
    * per round (O(log n) rounds of O(m) work — the forest/backbone
    * a 100 TB similarity graph is clustered by; single-linkage
    * dendrograms are exactly these merge rounds).
    *
    * On g02's weighted co-occurrence projection (`ew`, w ≥ 2),
    * MAXIMUM forest = strongest-ties backbone, under the total edge
    * order (w DESC, s1, s2) so selection is deterministic. Per round:
    * label edge endpoints with components (two keyed joins), keep
    * cross-component edges, elect each component's best edge by a
    * component-keyed window, then CONTRACT the selection pseudo-forest:
    * 2-cycles root at their smaller id (`t(t(c)) = c AND t(c) > c`),
    * then three pointer-jump squarings (`p ∘ p`) resolve chains ≤ 2³ —
    * every step a keyed join over the COMPONENT table (≤ |V| rows,
    * shrinking), never over edges. Two rounds unrolled to match the
    * oracle (the g01/g06 discipline); output = chosen edges per round,
    * the dendrogram's first two levels. GraphSpec pins the sequential
    * Borůvka equality, forest laws (acyclic, n−c edges), and that the
    * bounded jumps genuinely converged on this corpus. */
  val g12 = Q("g12_boruvka_msf", {
    def roundCtes(comp: String, suf: String): String =
      s"""lab$suf AS (
         |  SELECT d.v AS u, d.nb AS v2, d.w, cu.c AS cu, cv.c AS cv,
         |    least(d.v, d.nb) AS l, greatest(d.v, d.nb) AS g
         |  FROM dirw d
         |  JOIN $comp cu ON cu.v = d.v
         |  JOIN $comp cv ON cv.v = d.nb
         |  WHERE cu.c <> cv.c),
         |sel$suf AS (
         |  SELECT cu AS c, cv AS tgt, l, g, w FROM (
         |    SELECT cu, cv, l, g, w,
         |      row_number() OVER (PARTITION BY cu
         |        ORDER BY w DESC, l, g) AS rk
         |    FROM lab$suf) r WHERE rk = 1),
         |t$suf AS (
         |  SELECT ids.c, coalesce(s.tgt, ids.c) AS tc
         |  FROM (SELECT DISTINCT c FROM $comp) ids
         |  LEFT JOIN sel$suf s ON s.c = ids.c),
         |root$suf AS (
         |  SELECT a.c,
         |    CASE WHEN b.tc = a.c AND a.tc > a.c THEN a.c ELSE a.tc END AS p
         |  FROM t$suf a JOIN t$suf b ON b.c = a.tc),
         |j1$suf AS (SELECT a.c, b.p FROM root$suf a JOIN root$suf b ON b.c = a.p),
         |j2$suf AS (SELECT a.c, b.p FROM j1$suf a JOIN j1$suf b ON b.c = a.p),
         |j3$suf AS (SELECT a.c, b.p FROM j2$suf a JOIN j2$suf b ON b.c = a.p),
         |comp$suf AS (
         |  SELECT m.v, j.p AS c FROM $comp m JOIN j3$suf j ON j.c = m.c)"""
        .stripMargin
    s"""WITH ps AS (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |pdeg AS (SELECT pk, count(*) AS d FROM ps GROUP BY pk),
       |kept AS (
       |  SELECT ps.pk, ps.sk FROM ps JOIN pdeg ON pdeg.pk = ps.pk
       |  WHERE pdeg.d <= $ProjDegCap),
       |ew AS (
       |  SELECT a.sk AS s1, b.sk AS s2, count(*) AS w
       |  FROM kept a JOIN kept b ON a.pk = b.pk AND a.sk < b.sk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |dirw AS (
       |  SELECT s1 AS v, s2 AS nb, w FROM ew
       |  UNION ALL SELECT s2 AS v, s1 AS nb, w FROM ew),
       |comp0 AS (SELECT DISTINCT v, v AS c FROM dirw),
       |${roundCtes("comp0", "a")},
       |${roundCtes("compa", "b")}
       |SELECT * FROM (
       |  SELECT 1 AS round, l AS u, g AS v, CAST(w AS BIGINT) AS w
       |  FROM (SELECT DISTINCT l, g, w FROM sela)
       |  UNION ALL
       |  SELECT 2, l, g, CAST(w AS BIGINT)
       |  FROM (SELECT DISTINCT l, g, w FROM selb))
       |ORDER BY round, u, v""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ew = s.read.parquet(ensureWeightedEdges(s, d))
    val dirw = ew.select(col("s1").as("v"), col("s2").as("nb"), col("w"))
      .union(ew.select(col("s2").as("v"), col("s1").as("nb"), col("w")))
      .localCheckpoint()
    var comp = dirw.select(col("v")).distinct()
      .select(col("v"), col("v").as("c"))
      .localCheckpoint()
    var out: DataFrame = null
    for (round <- 1 to 2) {
      // round 1's component map is the identity - labelling the edge
      // table through it would be two no-op joins over the largest
      // frame in the query (measured ~1.9 s of the round cost at sf0.1)
      val lab = (if (round == 1)
        dirw.select(col("v").as("cu"), col("nb").as("cv"),
          col("v"), col("nb"), col("w"))
      else
        dirw
          .join(comp.select(col("v"), col("c").as("cu")), "v")
          .join(comp.select(col("v").as("nb"), col("c").as("cv")), "nb"))
        .filter(col("cu") =!= col("cv"))
        .select(col("cu"), col("cv"),
          least(col("v"), col("nb")).as("l"),
          greatest(col("v"), col("nb")).as("g"), col("w"))
      val wSel = Window.partitionBy("cu")
        .orderBy(col("w").desc, col("l"), col("g"))
      val sel = lab.withColumn("rk", row_number().over(wSel))
        .filter(col("rk") === 1)
        .select(col("cu").as("c"), col("cv").as("tgt"),
          col("l"), col("g"), col("w"))
        .localCheckpoint()
      val chosen = sel.select("l", "g", "w").distinct()
        .select(lit(round).as("round"), col("l").as("u"),
          col("g").as("v"), col("w").cast("long").as("w"))
      out = if (out == null) chosen else out.unionByName(chosen)
      val t = comp.select("c").distinct()
        .join(sel.select(col("c"), col("tgt")), Seq("c"), "left")
        .select(col("c"), coalesce(col("tgt"), col("c")).as("tc"))
      val t2 = t.as("a")
        .join(t.as("b"), col("b.c") === col("a.tc"))
        .select(col("a.c"), col("a.tc"), col("b.tc").as("ttc"))
      // the pointer tables are component-sized (<= |V| rows, shrinking);
      // 3 self-join squarings only double a SHORT lineage, so no
      // per-jump checkpoint - each was a full job's scheduling overhead
      // (measured ~0.4 s x 6 across the two rounds at sf0.1)
      var p = t2.select(col("c"),
        when(col("ttc") === col("c") && col("tc") > col("c"), col("c"))
          .otherwise(col("tc")).as("p"))
      for (_ <- 1 to 3) {
        p = p.as("a").join(p.as("b"), col("b.c") === col("a.p"))
          .select(col("a.c"), col("b.p").as("p"))
      }
      // r8 ADVICE: 3 squarings resolve chains ≤ 8, which covers every
      // selection pseudo-forest on the shipped corpus but is NOT a law
      // of the algorithm — a corpus with longer best-edge chains would
      // mislabel components in BOTH engines and the hash compare could
      // not catch it. Assert the fixpoint in-op (p∘p == p) so the
      // failure is loud and names its fix. The table is
      // component-sized, so the checkpoint + count are cheap jobs.
      p = p.localCheckpoint()
      val unresolved = p.as("a")
        .join(p.as("b"), col("b.c") === col("a.p"))
        .filter(col("b.p") =!= col("a.p")).count()
      require(unresolved == 0,
        s"g12 round $round: pointer jumping left $unresolved chains " +
          "unresolved (length > 8) — raise the squaring count")
      comp = comp.join(p.withColumnRenamed("c", "cOld"),
          col("cOld") === col("c"))
        .select(col("v"), col("p").as("c"))
        .localCheckpoint()
    }
    out.orderBy("round", "u", "v")
  }

  // ---------------------------------------------------------------- g14
  /** Unrolled peel depth per truss level (each level's chain ends in an
    * in-op fixpoint assertion, so the depth is a proven bound for the
    * corpus, not an assumption). */
  private val TrussRounds = 3

  /** Trussness decomposition by iterative EDGE peeling (Cohen 2008;
    * distributed form Cohen, MapReduce 2009) — g08's peel one
    * structural level up: k-core removes NODES by degree, k-truss
    * removes EDGES by triangle support (an edge survives the k-level
    * while it closes ≥ k−2 triangles with co-surviving edges), and the
    * per-edge truss NUMBER (max k whose truss contains the edge) is
    * the standard cohesion certificate — a star centre sails through a
    * k-core and is shredded by a truss. Two levels are peeled (k = 3
    * and k = 4, each to ITS fixpoint — 4-truss ⊆ 3-truss, so the
    * levels nest and `truss_number = 2 + in3 + in4`); each peel round
    * is one per-edge support count (the g03 edge×adjacency triangle
    * join, on the CURRENT shrinking edge set) + one filter, with
    * `localCheckpoint` cutting lineage per round (the g08/d08
    * discipline). [[TrussRounds]] rounds unrolled per level (the
    * g01/g06 convention), then an in-op FIXPOINT assertion — one more
    * support pass must remove nothing (the g12 rule: corpus-dependence
    * is asserted, not assumed) — so the flags are true trusses, not
    * horizon artifacts. On this corpus the two levels exercise both
    * regimes: the 3-peel stabilises immediately, the 4-peel CASCADES
    * (edges that had support lose it as their triangle partners die).
    * Runs over g05's materialised artifact; every stage is
    * edge-table-sized with map-side-combined aggs. */
  val g14 = Q("g14_ktruss", {
    // one peel chain: {p}0 := em, then rounds × (support → filter).
    // Every CTE in the truss part is MATERIALIZED: DuckDB 1.0 inlines
    // CTEs by default, and a 3-deep chain whose every round references
    // its predecessor 3× (twice via dx, once as z) would re-evaluate
    // the whole projection derivation exponentially — the un-hinted
    // form does not finish at sf0.01.
    def chain(p: String, t: Int): String =
      (0 until TrussRounds).map { r =>
        s"""dx$p$r AS MATERIALIZED (
           |  SELECT s1 AS v, s2 AS nb FROM $p$r
           |  UNION ALL SELECT s2 AS v, s1 AS nb FROM $p$r),
           |sp$p$r AS MATERIALIZED (
           |  SELECT z.s1, z.s2, count(*) AS sup FROM $p$r z
           |  JOIN dx$p$r x ON x.v = z.s1
           |  JOIN dx$p$r y ON y.v = z.s2 AND y.nb = x.nb
           |  GROUP BY z.s1, z.s2),
           |$p${r + 1} AS MATERIALIZED (
           |  SELECT z.s1, z.s2, sp.sup FROM $p$r z
           |  JOIN sp$p$r sp ON sp.s1 = z.s1 AND sp.s2 = z.s2
           |  WHERE sp.sup >= $t)""".stripMargin
      }.mkString(",\n") + s",\n${p}f AS (SELECT * FROM $p$TrussRounds)"
    s"""WITH $projEdgeCtes,
       |em AS MATERIALIZED (SELECT s1, s2 FROM e),
       |dxe AS MATERIALIZED (
       |  SELECT s1 AS v, s2 AS nb FROM em
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM em),
       |spe AS MATERIALIZED (
       |  SELECT em.s1, em.s2, count(*) AS sup FROM em
       |  JOIN dxe x ON x.v = em.s1
       |  JOIN dxe y ON y.v = em.s2 AND y.nb = x.nb
       |  GROUP BY em.s1, em.s2),
       |f0 AS MATERIALIZED (
       |  SELECT em.s1, em.s2, coalesce(spe.sup, 0) AS sup0 FROM em
       |  LEFT JOIN spe ON spe.s1 = em.s1 AND spe.s2 = em.s2),
       |t30 AS MATERIALIZED (SELECT s1, s2 FROM em),
       |${chain("t3", 1)},
       |t40 AS MATERIALIZED (SELECT s1, s2 FROM em),
       |${chain("t4", 2)}
       |SELECT f0.s1, f0.s2, CAST(f0.sup0 AS BIGINT) AS sup0,
       |  t3f.s1 IS NOT NULL AS in_truss3,
       |  t4f.s1 IS NOT NULL AS in_truss4,
       |  CAST(2 + (t3f.s1 IS NOT NULL)::INT + (t4f.s1 IS NOT NULL)::INT
       |       AS BIGINT) AS truss_number,
       |  CAST(coalesce(t3f.sup, 0) AS BIGINT) AS truss3_sup
       |FROM f0
       |LEFT JOIN t3f ON t3f.s1 = f0.s1 AND t3f.s2 = f0.s2
       |LEFT JOIN t4f ON t4f.s1 = f0.s1 AND t4f.s2 = f0.s2
       |ORDER BY f0.s1, f0.s2""".stripMargin
  }) { (s, d) =>
    val e0 = s.read.parquet(ensureProjection(s, d))
      .select("s1", "s2").localCheckpoint()
    def support(e: DataFrame): DataFrame = {
      val dx = e.select(col("s1").as("v"), col("s2").as("nb"))
        .union(e.select(col("s2").as("v"), col("s1").as("nb")))
      e.join(dx.select(col("v").as("s1"), col("nb").as("w")), "s1")
        .join(dx.select(col("v").as("s2"), col("nb").as("w")),
          Seq("s2", "w"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("sup"))
    }
    // peel to the asserted fixpoint: rounds × (support → inner-join
    // filter), then one EXTRA support pass that must remove nothing
    def truss(t: Int): DataFrame = {
      var cur = e0
      for (_ <- 0 until TrussRounds)
        cur = cur.select("s1", "s2")
          .join(support(cur.select("s1", "s2")), Seq("s1", "s2"))
          .filter(col("sup") >= t)
          .localCheckpoint()
      val again = cur.select("s1", "s2")
        .join(support(cur.select("s1", "s2")), Seq("s1", "s2"))
        .filter(col("sup") >= t).count()
      require(again == cur.count(),
        s"truss level $t did not converge in $TrussRounds rounds")
      cur
    }
    val f0 = e0.join(support(e0), Seq("s1", "s2"), "left")
      .select(col("s1"), col("s2"),
        coalesce(col("sup"), lit(0L)).as("sup0"))
    val t3 = truss(1)
    val t4 = truss(2)
    f0
      .join(t3.select(col("s1"), col("s2"), lit(true).as("in3"),
        col("sup").as("t3sup")), Seq("s1", "s2"), "left")
      .join(t4.select(col("s1"), col("s2"), lit(true).as("in4")),
        Seq("s1", "s2"), "left")
      .select(col("s1"), col("s2"), col("sup0").cast("long"),
        coalesce(col("in3"), lit(false)).as("in_truss3"),
        coalesce(col("in4"), lit(false)).as("in_truss4"),
        (lit(2) + coalesce(col("in3"), lit(false)).cast("int") +
          coalesce(col("in4"), lit(false)).cast("int")).cast("long")
          .as("truss_number"),
        coalesce(col("t3sup"), lit(0L)).cast("long").as("truss3_sup"))
      .orderBy("s1", "s2")
  }

  // ---------------------------------------------------------------- g15
  /** Link prediction over the projection — the WEDGE-ENUMERATION
    * dataflow (common-neighbor scoring of non-adjacent pairs) that
    * closes the classic neighborhood-method family (Liben-Nowell &
    * Kleinberg 2003): for every pair at distance exactly 2, four
    * standard scores, all in exact integers — `cn` (common neighbor
    * count), `jaccard_ppm` = cn·10⁶ div (deg(a)+deg(b)−cn),
    * `ra_ppm` = Σ_w 10⁶ div deg(w) (Zhou et al. 2009's resource
    * allocation — the 1/deg sum quantised PER TERM to the ppm grid, so
    * the sum is order-free integer addition; Adamic-Adar's 1/log deg
    * is the same shape with a non-replayable transcendental, RA is the
    * standard drop-in), and `pa` = deg(a)·deg(b) (preferential
    * attachment). Dataflow: one wedge join (dirx(w,a) ⋈ dirx(w,b),
    * a < b — per-hub cost deg², bounded by the projection's
    * [[TriTopK]] degree cap, the g03 sparsify-first discipline), one
    * per-pair agg, one ANTI join against the edge set (predicted links
    * must NOT already exist), two degree joins. Every stage is
    * edge-table-sized; the degree table is node-sized (broadcast
    * candidate at 100 TB). Runs over g05's materialised artifact. */
  val g15 = Q("g15_link_prediction",
    s"""WITH $projEdgeCtes,
       |dirx AS (
       |  SELECT s1 AS v, s2 AS nb FROM e
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM e),
       |deg AS (SELECT v, count(*) AS d FROM dirx GROUP BY v),
       |wedge AS (
       |  SELECT a.nb AS s1, b.nb AS s2,
       |    count(*) AS cn,
       |    sum(1000000 // dw.d) AS ra_ppm
       |  FROM dirx a
       |  JOIN dirx b ON b.v = a.v AND a.nb < b.nb
       |  JOIN deg dw ON dw.v = a.v
       |  GROUP BY a.nb, b.nb),
       |cand AS (
       |  SELECT w.* FROM wedge w
       |  LEFT JOIN e ON e.s1 = w.s1 AND e.s2 = w.s2
       |  WHERE e.s1 IS NULL)
       |SELECT c.s1, c.s2, CAST(c.cn AS BIGINT) AS cn,
       |  CAST(c.cn * 1000000 // (da.d + db.d - c.cn) AS BIGINT)
       |    AS jaccard_ppm,
       |  CAST(c.ra_ppm AS BIGINT) AS ra_ppm,
       |  CAST(da.d * db.d AS BIGINT) AS pa
       |FROM cand c
       |JOIN deg da ON da.v = c.s1
       |JOIN deg db ON db.v = c.s2
       |ORDER BY c.s1, c.s2""".stripMargin) { (s, d) =>
    val e = s.read.parquet(ensureProjection(s, d))
      .select("s1", "s2").localCheckpoint()
    val dirx = e.select(col("s1").as("v"), col("s2").as("nb"))
      .union(e.select(col("s2").as("v"), col("s1").as("nb")))
      .localCheckpoint()
    val deg = dirx.groupBy("v").agg(count(lit(1)).as("d"))
      .localCheckpoint() // consumed by the wedge join + both endpoints
    val wedge = dirx.select(col("v").as("w"), col("nb").as("s1"))
      .join(dirx.select(col("v").as("w"), col("nb").as("s2")), "w")
      .filter(col("s1") < col("s2"))
      .join(broadcast(deg.select(col("v").as("w"), col("d").as("dw"))), "w")
      .groupBy("s1", "s2")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div dw")).as("ra_ppm"))
    val cand = wedge.join(e, Seq("s1", "s2"), "left_anti")
    cand
      .join(broadcast(deg.select(col("v").as("s1"), col("d").as("da"))),
        "s1")
      .join(broadcast(deg.select(col("v").as("s2"), col("d").as("db"))),
        "s2")
      .select(col("s1"), col("s2"), col("cn").cast("long"),
        expr("cn * 1000000 div (da + db - cn)").cast("long")
          .as("jaccard_ppm"),
        col("ra_ppm").cast("long"),
        (col("da") * col("db")).cast("long").as("pa"))
      .orderBy("s1", "s2")
  }

  // ---------------------------------------------------------------- g16
  /** Degree assortativity (Newman 2002) — the one-number mixing report
    * every graph release publishes (do hubs attach to hubs, r > 0, or
    * to leaves, r < 0?), over the SAME mutual top-k projection the
    * triangle/k-core family reads. For an undirected graph the Pearson
    * correlation over edge-endpoint degree pairs (each edge counted in
    * both orientations, so x and y are exchangeable) collapses to
    * r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) — NO square roots, so the
    * whole statistic is exact integer arithmetic up to ONE final
    * symmetric-truncation division to micros (q60's signed-div
    * convention). Exactness at scale (r10 ADVICE): the sums and the
    * M·Σ−(Σ)² products accumulate in DECIMAL(38,0) — the same headroom
    * as DuckDB's HUGEINT sum path — never in Long, which would wrap
    * silently at M ≳ 10¹⁰ pairs; a q62-style in-op guard then proves
    * num/den are non-null (the Spark decimal-overflow signature) and
    * still fit the report's BIGINT columns, failing loudly one growth
    * step before either engine could misreport. Dataflow: the memoised
    * projection artifact (g05's amortisation — no lineitem scan), one
    * degree agg, two broadcast degree attaches, one 6-scalar fold.
    * The report also carries the raw integer sums so a consumer can
    * re-derive r at any precision.
    * Zero-guard: a REGULAR graph has den = 0 (assortativity undefined);
    * the op emits 0 with the den column making the case visible (the
    * p15 convention). */
  val g16 = Q("g16_degree_assortativity",
    s"""WITH $projEdgeCtes,
       |du AS (SELECT s1 AS v FROM e UNION ALL SELECT s2 FROM e),
       |deg AS (SELECT v, count(*) AS d FROM du GROUP BY v),
       |pairs AS (
       |  SELECT d1.d AS x, d2.d AS y
       |  FROM e JOIN deg d1 ON d1.v = e.s1 JOIN deg d2 ON d2.v = e.s2
       |  UNION ALL
       |  SELECT d2.d, d1.d
       |  FROM e JOIN deg d1 ON d1.v = e.s1 JOIN deg d2 ON d2.v = e.s2),
       |agg AS (
       |  SELECT count(*) AS m, sum(x * y) AS sxy, sum(x) AS sx,
       |    sum(x * x) AS sx2
       |  FROM pairs)
       |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       |  CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       |  CAST(m * sxy - sx * sx AS BIGINT) AS num,
       |  CAST(m * sx2 - sx * sx AS BIGINT) AS den,
       |  CAST(CASE WHEN m * sx2 - sx * sx = 0 THEN 0
       |    WHEN m * sxy - sx * sx >= 0
       |      THEN (m * sxy - sx * sx) * 1000000 // (m * sx2 - sx * sx)
       |    ELSE -((sx * sx - m * sxy) * 1000000 // (m * sx2 - sx * sx))
       |  END AS BIGINT) AS assortativity_micro
       |FROM agg""".stripMargin) { (s, d) =>
    val e = s.read.parquet(ensureProjection(s, d))
      .select(col("s1"), col("s2"))
    val deg = e.select(col("s1").as("v"))
      .unionAll(e.select(col("s2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withD = e
      .join(broadcast(deg.select(col("v").as("s1"), col("d").as("d1"))), "s1")
      .join(broadcast(deg.select(col("v").as("s2"), col("d").as("d2"))), "s2")
    val pairs = withD.select(col("d1").as("x"), col("d2").as("y"))
      .unionAll(withD.select(col("d2").as("x"), col("d1").as("y")))
    val nNodes = deg.count()
    // DECIMAL(38,0) accumulation end-to-end (the DuckDB-HUGEINT-parity
    // path): Long would wrap silently in m*sxy / m*sx2 / sx*sx at scale
    val agg = pairs.agg(count(lit(1)).as("m"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sx2"))
      .selectExpr("m",
        "CAST(m AS DECIMAL(38,0)) * sxy - sx * sx AS num",
        "CAST(m AS DECIMAL(38,0)) * sx2 - sx * sx AS den")
      .localCheckpoint() // 1 row; read by the guard AND the finishing
    // q62 discipline: a null here is the Spark decimal-overflow
    // signature; a 64-bit misfit means the BIGINT report columns (and
    // DuckDB's CAST(HUGEINT AS BIGINT)) would be the next thing to
    // break — fail loudly first
    agg.collect().foreach { r =>
      require(!r.isNullAt(r.fieldIndex("num")) &&
          !r.isNullAt(r.fieldIndex("den")),
        "g16: num/den overflowed DECIMAL(38,0) to null — the graph " +
          "outgrew the 38-digit assortativity headroom")
      val num = BigInt(r.getDecimal(r.fieldIndex("num")).toBigInteger)
      val den = BigInt(r.getDecimal(r.fieldIndex("den")).toBigInteger)
      require(num.abs <= Long.MaxValue && den.abs <= Long.MaxValue,
        s"g16: num=$num den=$den no longer fit the report's BIGINT " +
          "columns — widen the report schema before trusting r")
    }
    agg
      .selectExpr("CAST(m div 2 AS BIGINT) AS n_edges",
        s"CAST($nNodes AS BIGINT) AS n_nodes",
        "CAST(num AS BIGINT) AS num",
        "CAST(den AS BIGINT) AS den",
        """CAST(CASE WHEN den = 0 THEN 0
          | WHEN num >= 0 THEN (num * 1000000) DIV den
          | ELSE -((-num * 1000000) DIV den)
          | END AS BIGINT) AS assortativity_micro"""
          .stripMargin.replace("\n", " "))
  }

  // ---------------------------------------------------------------- g17
  /** Modularity of the g06 community partition (Newman & Girvan 2004) —
    * the number that tells you whether label propagation found real
    * structure or noise: Q = Σ_c [ L_c/m − (D_c/2m)² ], where L_c =
    * intra-community edges, D_c = community degree sum, m = edges. g06
    * ships the PARTITION; without its quality score a pipeline cannot
    * compare sparsification knobs ([[TriTopK]]) or stop an iterative
    * clustering — this is the evaluation half, exactly as ml03/ml20
    * evaluate the classifiers.
    *
    * Zero-drift composition (the ml03 technique): the Spark side runs
    * [[g06]] itself for the labels, and the oracle splices g06's own
    * SQL verbatim as a CTE — the partition DEFINITIONS cannot diverge
    * from the operator they score. Determinism: L_c, D_c, m and the
    * degree-square sum are all INTEGERS (exact, order-free); the only
    * doubles are per-row single expressions from those integers
    * (identical IEEE shapes in both engines) — no float accumulation
    * anywhere. Σ D_c² ≤ 4m² stays in BIGINT up to m ≈ 1.5e9 edges;
    * beyond that the sum widens to DECIMAL — the g16 headroom rule.
    *
    * Scale: reads the memoised g05 projection (edge-table-sized); two
    * keyed label joins onto the edge list, one degree agg, one
    * community agg with map-side combine, two broadcast scalars. No
    * stage sees the corpus. */
  val g17 = Q("g17_modularity",
    s"""WITH $projEdgeCtes,
       |g06o AS (${g06.oracle.get}),
       |lab AS (SELECT node AS v, label AS lbl FROM g06o),
       |dirx AS (
       |  SELECT s1 AS v, s2 AS nb FROM e
       |  UNION ALL SELECT s2 AS v, s1 AS nb FROM e),
       |deg AS (SELECT v, count(*) AS deg FROM dirx GROUP BY v),
       |cstats AS (
       |  SELECT lab.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(deg.deg) AS BIGINT) AS degree_sum
       |  FROM lab JOIN deg ON deg.v = lab.v GROUP BY 1),
       |cintra AS (
       |  SELECT a.lbl, CAST(count(*) AS BIGINT) AS intra_edges
       |  FROM e JOIN lab a ON a.v = e.s1 JOIN lab b ON b.v = e.s2
       |  WHERE a.lbl = b.lbl GROUP BY 1),
       |j AS (
       |  SELECT c.lbl, c.n_nodes, c.degree_sum,
       |    coalesce(i.intra_edges, 0) AS intra_edges
       |  FROM cstats c LEFT JOIN cintra i ON i.lbl = c.lbl),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
       |gsum AS (
       |  SELECT CAST(sum(intra_edges) AS BIGINT) AS intra,
       |    CAST(sum(degree_sum * degree_sum) AS BIGINT) AS degsq
       |  FROM j)
       |SELECT j.lbl AS community, j.n_nodes, j.intra_edges, j.degree_sum,
       |  CAST(j.intra_edges AS DOUBLE) / m.m
       |    - (CAST(j.degree_sum AS DOUBLE) / (2.0 * m.m))
       |      * (CAST(j.degree_sum AS DOUBLE) / (2.0 * m.m)) AS q_c,
       |  CAST(gsum.intra AS DOUBLE) / m.m
       |    - CAST(gsum.degsq AS DOUBLE) / (4.0 * m.m * m.m) AS modularity
       |FROM j CROSS JOIN m CROSS JOIN gsum
       |ORDER BY community""".stripMargin) { (s, d) =>
    val e = s.read.parquet(ensureProjection(s, d))
    val lab = g06.run(s, d)
      .select(col("node").as("v"), col("label").as("lbl"))
      .localCheckpoint() // node-sized; feeds three keyed joins
    val dirx = e.select(col("s1").as("v"))
      .union(e.select(col("s2").as("v")))
    val deg = dirx.groupBy("v").agg(count(lit(1)).as("deg"))
    val cstats = lab.join(deg, "v").groupBy("lbl")
      .agg(count(lit(1)).cast("long").as("n_nodes"),
        sum("deg").cast("long").as("degree_sum"))
    val cintra = e
      .join(lab.select(col("v").as("s1"), col("lbl").as("la")), "s1")
      .join(lab.select(col("v").as("s2"), col("lbl").as("lb")), "s2")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl"))
      .agg(count(lit(1)).cast("long").as("intra_edges"))
    val j = cstats.join(cintra, Seq("lbl"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .localCheckpoint() // community-sized; feeds globals and output
    val mDf = e.agg(count(lit(1)).cast("long").as("m"))
    val glob = j.agg(sum("intra_edges").cast("long").as("intra"),
      sum(col("degree_sum") * col("degree_sum")).cast("long").as("degsq"))
    j.crossJoin(broadcast(mDf)).crossJoin(broadcast(glob))
      .select(col("lbl").as("community"), col("n_nodes"),
        col("intra_edges"), col("degree_sum"),
        (col("intra_edges").cast("double") / col("m")
          - (col("degree_sum").cast("double") / (lit(2.0) * col("m")))
            * (col("degree_sum").cast("double") / (lit(2.0) * col("m"))))
          .as("q_c"),
        (col("intra").cast("double") / col("m")
          - col("degsq").cast("double")
            / (lit(4.0) * col("m") * col("m"))).as("modularity"))
      .orderBy("community")
  }

  def all: Seq[Q] =
    Seq(g01, g02, g03, g04, g05, g06, g07, g08, g09, g10, g11, g12, g13,
      g14, g15, g16, g17)
}

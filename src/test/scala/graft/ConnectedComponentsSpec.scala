package graft

import org.apache.spark.sql.functions._

/** Property check for the iterative min-label propagation in
  * [[graft.ops.Dedup.connectedComponents]]: on seeded random graphs the
  * result must equal an independent union-find's components (labelled by
  * min member). Random shapes exercise chains, cliques, singletons, and
  * multi-hop label funnels that the fixture corpus can't. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-label per component: roots are minimal after min-directed unions
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private val implementations = Seq[
      (String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame)](
    "propagation" -> (ops.Dedup.connectedComponents(_, _)),
    "large/small-star" -> (ops.Dedup.connectedComponentsStars(_, _)))

  test("random graphs: both implementations equal union-find components") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(20)
      val nEdges = rnd.nextInt(25)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val expected = unionFind(n, edges)
      val nodes = (0 until n).map(_.toLong).toDF("node")
      val edgeDf = edges.toDF("i", "j")
      for ((name, cc) <- implementations) {
        val got = cc(nodes, edgeDf)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected,
          s"[$name] trial $trial (n=$n, edges=${edges.size}): " +
            s"diff=${(got.toSet diff expected.toSet).take(5)}")
      }
    }
  }

  test("edge cases: empty edge set and a full chain, both implementations") {
    val nodes = (0L until 10L).toDF("node")
    for ((name, cc) <- implementations) {
      val none = cc(nodes, Seq.empty[(Long, Long)].toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(none == (0L until 10L).map(i => i -> i).toMap, s"[$name]")
      // 0-1-2-...-9 chain: 9 hops must all funnel to label 0 — the shape
      // where star contraction's O(log n) rounds beat propagation's O(n)
      val chain = (0L until 9L).map(i => (i, i + 1)).toDF("i", "j")
      val got = cc(nodes, chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L until 10L).map(i => i -> 0L).toMap, s"[$name]")
    }
  }

  test("long chain: star contraction converges where propagation fails loudly") {
    // 120-node path graph, diameter 119: star contraction must be exact
    // in its O(log n) rounds; propagation's default round budget (20)
    // cannot reach the far end — and must THROW rather than silently
    // return split clusters.
    val n = 120
    val nodes = (0L until n.toLong).toDF("node")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("i", "j")
    val stars = ops.Dedup.connectedComponentsStars(nodes, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == (0L until n.toLong).map(i => i -> 0L).toMap)
    val ex = intercept[IllegalStateException](
      ops.Dedup.connectedComponents(nodes, chain).collect())
    assert(ex.getMessage.contains("did not converge"))
  }
}

package graft

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._

import graft.functions.KmvSketchAgg

/** Pins the KMV sketch (q47, [[graft.functions.KmvSketchAgg]] — the
  * TypedImperativeAggregate tier): the exact-merge law that makes the
  * sketch shuffle-safe, the n < k exactness branch, serialization
  * round-trip, estimator accuracy vs exact distincts, and that Spark
  * plans it as a two-phase ObjectHashAggregate (partial combine before
  * the exchange — the bounded-state contract on the wire). */
class KmvSpec extends SparkSpec {

  private val K = 64

  test("kmv: state equals the SQL k-min of distinct hashes; n<k branch exact") {
    val rows = ops.Relational.q47.run(spark, sf).collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol.keySet == Set("user_id", "event_type", "props"))
    // recompute each state from first principles with plain Spark SQL
    for ((cn, r) <- byCol) {
      val hs = model.Tables.events(spark, sf)
        .selectExpr(s"CAST(conv(substr(md5(concat('$cn:', CAST($cn AS STRING))), 1, 15), 16, 10) AS BIGINT) AS h")
        .filter(col("h").isNotNull)
        .distinct().orderBy("h").limit(K)
        .collect().map(_.getLong(0))
      assert(r.getLong(1) == hs.length, s"$cn n_retained")
      assert(r.getString(4) == hs.mkString(","), s"$cn state drift")
      assert(r.getLong(2) == hs.last, s"$cn kth")
      if (hs.length < K) {
        // fewer distincts than k: the sketch IS the distinct set
        val exact = model.Tables.events(spark, sf)
          .select(col(cn)).na.drop().distinct().count()
        assert(r.getLong(3) == exact, s"$cn exact branch")
      }
    }
  }

  test("kmv: estimate within KMV error bounds of the exact distinct count") {
    val rows = ops.Relational.q47.run(spark, sf).collect()
    for (r <- rows if r.getLong(1) == K) {
      val cn = r.getString(0)
      val exact = model.Tables.events(spark, sf)
        .select(col(cn)).na.drop().distinct().count()
      val est = r.getLong(3)
      // standard error ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
      val tol = math.max(1.0, 4.0 * exact / math.sqrt(K - 2.0))
      assert(math.abs(est - exact) <= tol,
        s"$cn est $est vs exact $exact (tol $tol)")
    }
  }

  test("kmv: merge of per-shard sketches equals the sketch of the union") {
    val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L), 8)
    val data = Seq.tabulate(500)(i => (i * 2654435761L) % 1000000 + 1)
    def sketch(xs: Seq[Long]) = {
      val b = agg.createAggregationBuffer()
      // drive update through the public add path: merge singleton buffers
      xs.foreach { v =>
        val one = agg.createAggregationBuffer(); one.add(v)
        agg.merge(b, one)
      }
      b
    }
    val whole = sketch(data)
    for (splitAt <- Seq(1, 7, 250, 499)) {
      val (a, c) = data.splitAt(splitAt)
      val merged = agg.merge(sketch(a), sketch(c))
      assert(merged.equals(whole), s"merge law at split $splitAt")
    }
    // dedup inside the sketch: duplicated input changes nothing
    assert(sketch(data ++ data.take(100)).equals(whole))
  }

  test("kmv: serialization round-trips the buffer exactly") {
    val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L), 16)
    val b = agg.createAggregationBuffer()
    Seq(5L, 3L, 99L, 3L, 0L, 1L << 59).foreach(b.add(_))
    val back = agg.deserialize(agg.serialize(b))
    assert(back.equals(b))
    val empty = agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
    assert(empty.isEmpty)
  }

  test("q59: set-op estimates sit in the KMV error band of the exact counts") {
    val rows = ops.Relational.q59.run(spark, sf).collect()
    assert(rows.length == 3)
    val pairs = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(pairs.keySet ==
      Set("lineitem_part", "orders_building", "users_customers"))
    // exact per-side distincts, recomputed from the raw tables
    def nd(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c)).na.drop().distinct().count()
    val exactSides = Map(
      "lineitem_part" -> (nd(model.Tables.lineitem(spark, sf), "l_partkey"),
        nd(model.Tables.part(spark, sf), "p_partkey")),
      "orders_building" -> (nd(model.Tables.orders(spark, sf), "o_custkey"),
        nd(model.Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === "BUILDING"), "c_custkey")),
      "users_customers" -> (nd(model.Tables.events(spark, sf), "user_id"),
        nd(model.Tables.customer(spark, sf), "c_custkey")))
    def tol(exact: Long, sigma: Double = 4.0) =
      math.max(2.0, sigma * exact / math.sqrt(K - 2.0))
    for ((pair, (estA, estB, estU, estI, exactI)) <- pairs) {
      val (exA, exB) = exactSides(pair)
      assert(math.abs(estA - exA) <= tol(exA), s"$pair estA $estA vs $exA")
      assert(math.abs(estB - exB) <= tol(exB), s"$pair estB $estB vs $exB")
      val exU = exA + exB - exactI
      assert(math.abs(estU - exU) <= tol(exU), s"$pair estU $estU vs $exU")
      // intersection compounds union error with the ratio's binomial
      // error — allow a wider 6-sigma band around the exact column
      assert(math.abs(estI - exactI) <= tol(exactI max exU, 6.0),
        s"$pair estI $estI vs $exactI")
      // structural sanity independent of the band
      assert(estU >= (estA max estB) - tol(exU).toLong, s"$pair union floor")
      assert(estI <= (estA min estB) + tol(exU).toLong, s"$pair intersect cap")
    }
    // regime checks: lineitem→part is full FK containment; events'
    // user_ids are a subset of customers
    assert(pairs("lineitem_part")._5 ==
      nd(model.Tables.lineitem(spark, sf), "l_partkey"))
    assert(pairs("users_customers")._5 ==
      nd(model.Tables.events(spark, sf), "user_id"))
  }

  test("kmv: plans as two-phase ObjectHashAggregate, no distinct expand") {
    val df = ops.Relational.q47.run(spark, sf)
    val plan = df.queryExecution.sparkPlan
    val objAggs = plan.collect { case o: ObjectHashAggregateExec => o }
    // partial + final per the single groupBy; NO extra aggregate pair
    // for a DISTINCT — dedup lives inside the sketch state
    assert(objAggs.size == 2, s"expected 2 ObjectHashAggregate nodes:\n$plan")
    val hashAggs = plan.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h }
    assert(hashAggs.isEmpty, s"unexpected HashAggregate (distinct rewrite?)")
  }
}

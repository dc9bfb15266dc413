package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Q
import graft.functions.GraftFunctions
import graft.model.Tables

/** Approximate-nearest-neighbour search over the `embeddings` table
  * (north-star requirement; ref: absent).
  *
  *  - `s01` brute-force top-k: the exact baseline. Query side is tiny and
  *    broadcast; the corpus streams through the codegen'd
  *    [[graft.functions.CosineSimilarity]] expression; ranking is
  *    TakeOrdered-per-query via a window. Cost O(|Q|·|corpus|·dims) —
  *    correct at any scale if |Q| is small, and embarrassingly parallel.
  *  - `s02` random-hyperplane LSH: the scale path. Each vector maps to a
  *    sign-bit bucket of `P` fixed hyperplanes (one map pass), candidate
  *    generation is an equi-join on bucket — linear shuffle instead of a
  *    cross join. Hyperplanes are literal constants generated from a
  *    fixed LCG so the DuckDB oracle evaluates the identical planes.
  */
object Similarity {

  /** P deterministic pseudo-random hyperplanes over 64 dims, components
    * in [-1, 1), from a fixed 48-bit LCG (java.util.Random constants).
    * Literal doubles round-trip exactly through decimal strings in both
    * engines, so the bucket computation is bit-identical. */
  val P = 6
  val Dims = 64
  val planes: Seq[Seq[Double]] = {
    var s = 42L
    def next(): Double = {
      s = (s * 0x5deece66dL + 0xbL) & ((1L << 48) - 1)
      (s.toDouble / (1L << 48).toDouble) * 2.0 - 1.0
    }
    Seq.fill(P)(Seq.fill(Dims)(next()))
  }

  private def planeSqlArray(p: Int): String =
    "[" + planes(p).map(_.toString).mkString(", ") + "]"

  /** dot(plane_p, embedding) in strictly ascending index order — Spark. */
  private def planeDotSpark(p: Int): String = {
    val arr = "array(" + planes(p).map(v => s"${v}D").mkString(", ") + ")"
    s"aggregate(zip_with($arr, embedding, (p, q) -> p * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  }

  /** Same dot in DuckDB. */
  private def planeDotSql(p: Int): String =
    s"list_sum(list_transform(generate_series(1, $Dims), k -> (${planeSqlArray(p)})[k] * CAST(embedding[k] AS DOUBLE)))"

  private def bucketSpark: String =
    (0 until P).map(p => s"CASE WHEN ${planeDotSpark(p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")
  private def bucketSql: String =
    (0 until P).map(p => s"CASE WHEN ${planeDotSql(p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")

  /** Cosine in DuckDB matching [[graft.functions.CosineSimilarity]]'s
    * accumulation order (ascending index, double precision). */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, $Dims), k -> CAST($x.embedding[k] AS DOUBLE) * CAST($y.embedding[k] AS DOUBLE)))"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  // ---------------------------------------------------------------- s01
  /** Exact top-5 neighbours for 10 query vectors, brute force. */
  val s01 = Q("s01_topk_cosine",
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id, embedding FROM e WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |         ${cosSql("q", "e")} AS cos
       |  FROM q JOIN e ON e.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_embedding")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("cosine_sim(q_embedding, embedding)").as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- s02
  /** LSH-bucketed top-3 within-bucket neighbours for every vector: the
    * linear-cost approximate variant. One projection pass computes the
    * sign-bit bucket; candidates come from an equi-join on bucket. */
  val s02 = Q("s02_lsh_topk",
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
       |pairs AS (
       |  SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id,
       |         ${cosSql("x", "y")} AS cos
       |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    GraftFunctions.register(s)
    val b = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), expr(bucketSpark).as("bucket"))
    val x = b.as("x")
    val y = b.as("y")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    x.join(y, col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("neighbor_id"),
        expr("cosine_sim(x.embedding, y.embedding)").as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  def all: Seq[Q] = Seq(s01, s02)
}

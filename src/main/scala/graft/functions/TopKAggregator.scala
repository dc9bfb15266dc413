package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (`Aggregator[IN, BUF, OUT]` — the engine's
  * custom-UDAF surface, SURVEY.md §7.3): keeps the k highest-scoring
  * (key, score) pairs per group with a bounded buffer, so the shuffle
  * carries at most k rows per group per partition — the mergeable-sketch
  * property that makes per-group top-k linear at any scale (same shape
  * as Spark's own TakeOrderedAndProject, but per group).
  *
  * Ordering: score descending, key ascending on ties — total and
  * deterministic, so results are oracle-comparable against a
  * `row_number()` window.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]]
    with Serializable {

  private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy { case (score, key) => (-score, key) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
    trim(b :+ ((a._2, a._1)))

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}

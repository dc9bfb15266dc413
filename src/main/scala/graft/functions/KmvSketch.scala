package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a native
  * `TypedImperativeAggregate` — the imperative-aggregate extension tier
  * (the remaining Catalyst surface next to the scalar expression d17,
  * the Generator t25, the whole-operator plan q46, and the typed
  * `Aggregator` ty01).
  *
  * State is the set of the k smallest DISTINCT hash values seen
  * (Bar-Yossef et al. 2002): bounded at k longs per group regardless of
  * input size, so the aggregate is map-side combinable and the shuffle
  * carries at most k values per (group, map partition) — the same
  * fixed-state contract as the q10c HLL registers, but with an EXACTLY
  * mergeable, exactly replayable state: the k smallest of a union is
  * the k smallest of the merged per-shard k-smallest (`KmvSpec` pins
  * the law), and a SQL engine can recompute the state verbatim with a
  * `row_number() <= k` over distinct hashes — which is how the q47
  * oracle checks every retained value, not just the estimate.
  *
  * The estimator is integer-exact by construction (the t17/q10c
  * determinism discipline): inputs are 60-bit non-negative hashes (15
  * md5 hex chars), and with n == k retained the estimate is
  * floor((k-1) * 2^60 / kth_min) — computed here in BigInt and by
  * DuckDB in HUGEINT, both exact integer floors of the same rational.
  * With n < k the state IS the distinct set, so the estimate is n,
  * exact. No float touches any value.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch k must be >= 2, got $k")

  override def inputTypes = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_retained", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("est_distinct", LongType, nullable = false),
    StructField("state", StringType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    require(v >= 0, s"kmv_sketch expects non-negative hashes, got $v")
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      // admission: one compare against the worst retained value; the
      // TreeSet dedups, so only a genuinely new smaller hash displaces
      if (buf.add(v) && buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size.toLong
    val kth = if (buf.isEmpty) -1L else buf.last.longValue()
    val est =
      if (n < k) n
      else ((BigInt(k - 1) << 60) / BigInt(kth)).toLong
    val sb = new java.lang.StringBuilder
    val it = buf.iterator()
    while (it.hasNext) {
      if (sb.length > 0) sb.append(',')
      sb.append(it.next().longValue())
    }
    new GenericInternalRow(Array[Any](n, kth, est,
      UTF8String.fromString(sb.toString)))
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar's scheme): each token is
  * hashed to 64 bits; per bit position the signed counts are accumulated
  * (+1 if the token's bit is set, −1 otherwise); the sign of each
  * accumulator becomes the output bit. Near-duplicate documents land at
  * small Hamming distance, so near-dup detection becomes
  * `bit_count(h1 # h2) <= t` — a cheap 64-bit op instead of a shingle
  * join. At scale: one map pass to fingerprint, then candidate pairing by
  * rotating-prefix buckets (sort by rotated fingerprint), never O(n²).
  *
  * Token hash is a 64-bit FNV-1a over the token's UTF-8 bytes —
  * dependency-free, stable across JVMs, and cheap enough to codegen. The
  * hash family is not available in DuckDB, so queries built on this are
  * rows-only checks; the ScalaTest spec pins exact values instead.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types._

  override def inputTypes =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv1a64(tokens.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Convenience for tests / non-Catalyst callers. */
  def ofTokens(tokens: Seq[String]): Long = {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      tokens.map(UTF8String.fromString).toArray)
    compute(arr)
  }
}

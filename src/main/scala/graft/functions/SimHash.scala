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
  * Token hash is md5-derived (the repo's portable-hash convention): the
  * first 8 digest bytes big-endian, rotated so the low 60 bits and top
  * 4 bits are exactly DuckDB's `CAST('0x'||substr(md5(t),1,15) AS
  * BIGINT)` / 16th hex char — both engines recompute identical 64-bit
  * token hashes without overflowing DuckDB's non-wrapping BIGINT, which
  * is what lets d05/d07/d09 carry full DuckDB oracles (an FNV-1a
  * variant was dependency-free but not expressible there, leaving the
  * simhash family rows-only).
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
  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 64-bit token hash from the md5 digest: v = first 8 bytes
    * big-endian; bits laid out as (v & 0xf) << 60 | v >>> 4 so that bit
    * b (b < 60) is bit b of DuckDB's 15-hex-char BIGINT cast and bits
    * 60..63 come from the 16th hex char — the exact values the oracle
    * SQL recomputes. */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) | ((v & 0xfL) << 60)
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = md5Hash64(tokens.getUTF8String(t).getBytes)
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

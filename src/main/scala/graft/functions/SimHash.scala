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
  * block bucketing ([[graft.ops.Dedup]] d07/d09), never O(n²).
  *
  * Two token-hash families behind one expression (`md5Mode`):
  *
  *  - '''production (default)''': FNV-1a 64 — 3 ops per byte, no digest
  *    allocation; this is the family the fingerprint pass runs at corpus
  *    scale, where the hash is the hot loop (cost ∝ corpus bytes).
  *  - '''oracle (`simhash64(toks, 'md5')`)''': first 8 md5 digest bytes
  *    big-endian, rotated so the low 60 bits and top 4 bits are exactly
  *    DuckDB's `CAST('0x'||substr(md5(t),1,15) AS BIGINT)` / 16th hex
  *    char — both engines recompute identical 64-bit token hashes
  *    without overflowing DuckDB's non-wrapping BIGINT, which is what
  *    lets d05/d07/d09 carry full DuckDB value/hash oracles.
  *
  * The families differ only in the per-token hash; every structural
  * property (bag semantics, locality, the d07/d09 pigeonhole bucketing
  * guarantee) holds identically under both, and DedupSpec runs the
  * d05↔d07 set-equality law under both.
  */
case class SimHash64(child: Expression, md5Mode: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types._

  override def inputTypes =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(child: Expression): SimHash64 = SimHash64(child, md5Mode = false)

  /** Per-thread MD5 instance, shared by every md5-family hash in this
    * package (simhash tokens, winnowing k-grams). */
  private[functions] val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](
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

  /** FNV-1a 64-bit (public-domain parameters): the production token
    * hash — xor-and-multiply per byte, no allocation, no digest state. */
  def fnvHash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, md5Mode: Boolean): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val bytes = tokens.getUTF8String(t).getBytes
        val h = if (md5Mode) md5Hash64(bytes) else fnvHash64(bytes)
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
  def ofTokens(tokens: Seq[String], md5Mode: Boolean = false): Long = {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      tokens.map(UTF8String.fromString).toArray)
    compute(arr, md5Mode)
  }
}

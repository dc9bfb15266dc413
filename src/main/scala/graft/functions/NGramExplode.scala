package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_explode(w, n)` — a native table-valued (`Generator`) form of
  * `explode(word_shingles(w, n))`: emits one row per n-word shingle
  * WITHOUT materialising the shingle array first.
  *
  * The array route holds every shingle of a document in memory at once —
  * for an L-token document that is ~n·L tokens of copied text per row
  * (a 3-gram array is three times the document), which is peak-memory,
  * GC, and spill pressure at 100 TB document sizes. The generator hands
  * `GenerateExec` a lazy iterator: one shingle exists at a time, O(n)
  * live bytes per row regardless of document length, and downstream
  * per-shingle operators (hash aggregates, LSH banding) consume it
  * streamingly. Same contract as [[WordShingles]] (null tokens read as
  * empty, < n words → no rows), so the DuckDB shingle CTE oracles both.
  *
  * This is the repo's UDTF tier: `Generator` is the Catalyst class
  * behind LATERAL VIEW / select-list explode, and a custom one slots
  * into the same `Generate` logical node and analyzer handling as the
  * built-ins — no new plan machinery needed.
  */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def elementSchema: StructType =
    StructType(StructField("s", StringType, nullable = false) :: Nil)
  override def prettyName: String = "ngram_explode"

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val words = v.asInstanceOf[ArrayData]
    val total = words.numElements() - n + 1
    if (total <= 0) return Iterator.empty
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < total
      override def next(): InternalRow = {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = if (words.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else words.getUTF8String(i + j)
          j += 1
        }
        i += 1
        new GenericInternalRow(Array[Any](UTF8String.concatWs(space, parts: _*)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

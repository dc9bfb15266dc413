package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** `n`-word shingles of a token array: equivalent to
  * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', w[i..i+n-1]))`
  * but as one compiled loop — the higher-order-function chain evaluates
  * an interpreted lambda (sequence + 3 array indexes + concat_ws) per
  * shingle, which dominated the d02/d03 scan stage. Returns an empty
  * array when the document has fewer than `n` words.
  *
  * CodegenFallback: the eval is a tight Scala loop over UTF8Strings; the
  * surrounding stage still whole-stage-codegens around it.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  import org.apache.spark.sql.types._

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val total = words.numElements()
    val count = total - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (words.isNullAt(i + j)) UTF8String.EMPTY_UTF8
        else words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

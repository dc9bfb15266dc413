package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two FLOAT vectors as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`) — the hot inner loop
  * of brute-force ANN compiles into the generated stage instead of
  * crossing a UDF boundary per row. Accumulation is a strictly ascending
  * index-order fold in double precision, matching the oracle SQL's
  * `list_sum(list_transform(...))` form bit-for-bit.
  *
  * Preference ladder (SURVEY.md §7.3): built-ins
  * (`aggregate(zip_with(...))`) express this too, but as an O(dims)
  * lambda-expression chain per row; a dedicated expression is the
  * idiomatic "custom scalar op Spark lacks" escalation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[CosineSimilarity]] over DOUBLE vectors — the Lloyd-iteration
  * variant (s06): iterated k-means centroids are exact double means,
  * and narrowing them to float would diverge from the DuckDB oracle
  * (float rounding differs cross-engine — see s05's decimal note), so
  * corpus vectors are widened float→double (exact) and both sides
  * share the double element type. Same ascending-index double fold,
  * same codegen shape. */
case class CosineSimilarityD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration so the expressions are reachable from SQL
  * (`expr("cosine_sim(a, b)")`) without depending on Spark's non-public
  * Column constructors. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_d", exprs => CosineSimilarityD(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head, md5Mode = simhashMd5Arg(exprs)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_edit_distance", exprs => BoundedEditDistance(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_explode", exprs => NGramExplode(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", exprs => KmvSketchAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
  }

  /** Optional 2nd arg of `simhash64`: a literal hash-family name —
    * 'md5' (oracle-recomputable) or 'fnv' (production default). */
  private[graft] def simhashMd5Arg(exprs: Seq[Expression]): Boolean =
    if (exprs.length < 2) false
    else exprs(1).eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String
          if s.toString == "md5" => true
      case s: org.apache.spark.unsafe.types.UTF8String
          if s.toString == "fnv" => false
      case other => throw new IllegalArgumentException(
        s"simhash64 mode must be 'md5' or 'fnv', got: $other")
    }

  def cosineSim(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"cosine_sim($a, $b)")
  }

  def simhash64(spark: SparkSession, tokens: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"simhash64($tokens)")
  }
}

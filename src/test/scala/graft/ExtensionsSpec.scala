package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  /** A second session on the shared context, built with the extensions
    * (getOrCreate would return the existing extension-less session, so
    * the active/default sessions are cleared first and restored after). */
  private def withExtensionSession[T](f: SparkSession => T): T = {
    val prior = SparkSession.getDefaultSession
    spark // force shared session (and its SparkContext) to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions))
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("injected functions resolve without manual registration") {
    withExtensionSession { ext =>
      import ext.implicits._
      val r = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
        .selectExpr("cosine_sim(a, b)", "dot_product(a, b)",
          "simhash64(array('x', 'y'))")
        .head()
      assert(r.getDouble(1) == 11.0)
      assert(r.getDouble(0) > 0.98)
    }
  }

  test("RewriteDotProducts: built-in aggregate/zip_with idiom becomes DotProduct") {
    withExtensionSession { ext =>
      // parquet-backed source: a literal LocalRelation would be
      // constant-folded wholesale, hiding whether the rule fired
      val df = model.Tables.embeddings(ext, sf).limit(50)
        .selectExpr("vec_id",
          """aggregate(zip_with(embedding, embedding,
            |  (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
            |CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS dot""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_product"), optimized)
      // value parity with the un-rewritten session (shared spark has no
      // extensions, so it evaluates the HOF chain)
      val viaRule = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaHof = model.Tables.embeddings(spark, sf).limit(50)
        .selectExpr("vec_id",
          """aggregate(zip_with(embedding, embedding,
            |  (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
            |CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS dot""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaRule == viaHof)
    }
  }

  test("rule leaves non-matching folds alone") {
    withExtensionSession { ext =>
      import ext.implicits._
      val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
        .selectExpr(
          // subtle difference: merge multiplies instead of adding
          """aggregate(zip_with(a, b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
            |CAST(1 AS DOUBLE), (acc, v) -> acc * v) AS notdot""".stripMargin)
      assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
      assert(df.head().getDouble(0) == 3.0 * 8.0)
    }
  }
}

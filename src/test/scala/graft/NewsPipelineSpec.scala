package graft

import org.apache.spark.sql.functions._

import graft.ops.NewsPipeline

class NewsPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("classify emits unknown/0.0 sentinel when no keyword hits") {
    val df = Seq((1L, "zzz yyy xxx"), (2L, ""), (3L, "spark spark"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = NewsPipeline.classify(df)
      .select("doc_id", "category", "confidence")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out(1L) == (("unknown", 0.0)))
    assert(out(2L) == (("unknown", 0.0)))
    assert(out(3L)._1 == "technology")
    assert(out(3L)._2 == 1.0)
    // NULL text -> sentinel, not NULL (the reference's non-string guard)
    assert(out(4L) == (("unknown", 0.0)))
  }

  test("classify tiebreak is first-in-lexicon order") {
    // one hit each for arts(window) and sports(fast): arts wins (earlier).
    val df = Seq((1L, "window fast")).toDF("doc_id", "text")
    val out = NewsPipeline.classify(df).select("category").head().getString(0)
    assert(out == "arts")
  }

  test("summary length law: budget = min(100, max(20, words/3))") {
    // deterministic pseudo-random word counts, incl. the law's breakpoints
    val counts = Seq(1, 5, 19, 20, 59, 60, 61, 299, 300, 301, 900) ++
      (1 to 50).map(i => 1 + (i * 37) % 400)
    val df = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val rows = NewsPipeline.summarize(df)
      .select("doc_id", "n_words", "budget", "summary").collect()
    rows.foreach { r =>
      val words = r.getLong(1)
      val budget = r.getLong(2)
      val expected = math.min(100, math.max(20, words / 3))
      assert(budget == expected, s"words=$words")
      // summary has min(budget, words) words
      val got = r.getString(3).split(" ").length
      assert(got == math.min(budget, words), s"words=$words budget=$budget")
    }
  }

  test("summarize truncates input to 5000 chars before budgeting") {
    val longWord = "a" * 4999
    val df = Seq((1L, longWord + " bbbb cccc")).toDF("doc_id", "text")
    // 5000-char prefix = longWord + " " → split yields ["a"*4999, ""]
    val out = NewsPipeline.summarize(df).select("n_words").head().getLong(0)
    assert(out == 2)
  }

  test("digest content is permutation-invariant (sorted bullets)") {
    val base = Seq(
      (1L, "spark query engine"), (2L, "spark sql runs"), (3L, "query spark fast"))
    def digestOf(rows: Seq[(Long, String)]): Map[String, String] = {
      val classified = NewsPipeline.classify(rows.toDF("doc_id", "text"))
        .filter(col("category") =!= "unknown")
      val sum = NewsPipeline.summarize(classified)
        .filter(col("summary") =!= "")
        .withColumn("bullet", concat(lit("- "), col("summary")))
      sum.groupBy("category")
        .agg(concat_ws("\n", sort_array(collect_list(col("bullet")))).as("content"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    assert(digestOf(base) == digestOf(base.reverse))
  }
}

package graft

import graft.functions.TextFunctions

/** Value-pins t19's corpus-level duplicate-sentence removal on the
  * sentence fixture: first occurrence survives, all later occurrences are
  * excised, documents reassemble in position order, and the global
  * kept/dropped accounting reconciles with a driver-side recompute. */
class LineDedupSpec extends SparkSpec {

  private lazy val docs = spark.read.schema("doc_id LONG, text STRING")
    .json(ops.NewsPipeline.summaryFixturePath)
    .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val out = ops.TextAnalysis.t19.run(spark, sf).collect()
    .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
    .toMap

  test("t19 equals a driver-side first-occurrence replay, doc for doc") {
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.toSeq.sortBy(_._1).map { case (id, text) =>
      val sents = TextFunctions.sentencesOf(text.take(5000))
      val kept = sents.filter(s => seen.add(s))
      id -> ((kept.mkString(" "), kept.length.toLong,
        (sents.length - kept.length).toLong))
    }.toMap
    assert(out == expected)
  }

  test("t19: boilerplate survives exactly once, accounting reconciles") {
    // doc 10 holds the first "Subscribe…" and first "All rights…" —
    // everything kept; docs 11/12/13 lose their repeats
    assert(out(10L)._3 == 0L, s"doc 10 must keep its sentences: ${out(10L)}")
    assert(out(11L)._3 == 1L && out(12L)._3 == 2L && out(13L)._3 == 1L,
      s"repeat docs must drop their boilerplate: ${out.view.filterKeys(_ >= 11L).toMap}")
    assert(!out(12L)._1.contains("Subscribe"),
      "doc 12's repeated boilerplate must be excised")
    assert(out(10L)._1.contains("Subscribe"),
      "doc 10's first occurrence must survive")
    // a corpus-wide invariant: kept sentences are globally unique
    val keptTotal = out.values.map(_._2).sum
    val distinctSents = docs.values
      .flatMap(t => TextFunctions.sentencesOf(t.take(5000))).toSet.size
    assert(keptTotal == distinctSents.toLong,
      s"kept=$keptTotal must equal distinct sentence count $distinctSents")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Pins t22's BPE laws on hand-built token tables, where ground truth
  * is checkable by eye: the merge-priority tie-break and the greedy
  * left-to-right non-overlapping application on same-symbol runs (the
  * one case where candidate positions conflict). */
class BpeSpec extends SparkSpec {

  /** (word, freq) pairs → the (word, freq, pos, sym) character token
    * table bpeRound consumes. */
  private def toks(words: (String, Long)*) = {
    import spark.implicits._
    words.toSeq.toDF("word", "freq")
      .select(col("word"), col("freq"),
        posexplode(split(col("word"), "")).as(Seq("pos0", "sym")))
      .filter(col("sym") =!= "")
      .select(col("word"), col("freq"), (col("pos0") + 1).as("pos"),
        col("sym"))
  }

  private def pair(top: org.apache.spark.sql.DataFrame): (String, String, Long) = {
    val r = top.collect()(0)
    (r.getString(0), r.getString(1), r.getLong(2))
  }

  private def seqOf(m: org.apache.spark.sql.DataFrame, word: String): Seq[String] =
    m.filter(col("word") === word).orderBy("pos")
      .collect().map(_.getString(3)).toSeq

  test("tie-break law: equal counts resolve by left symbol then right, ascending") {
    // (b,a) and (a,b) both appear with weight 2 — the winner must be
    // (a,b), purely by the a < b lexicographic tie-break
    val (top, _) = ops.TextAnalysis.bpeRound(toks("ba" -> 2L, "ab" -> 2L))
    assert(pair(top) == (("a", "b", 2L)))
  }

  test("tie-break law: count dominates the lexicographic order") {
    // (z,z) outweighs every alphabetically-earlier pair
    val (top, _) = ops.TextAnalysis.bpeRound(toks("zzz" -> 5L, "ab" -> 3L))
    // "zzz" has two (z,z) adjacencies x freq 5 = 10 > (a,b) count 3
    assert(pair(top) == (("z", "z", 10L)))
  }

  test("run-greedy law: a same-symbol run merges left-to-right without overlap") {
    // top pair in "aaaa" (freq 1) is (a,a) with count 3; greedy
    // application merges positions 1-2 and 3-4 -> [aa, aa], never the
    // overlapping middle pair
    val (top, merged) = ops.TextAnalysis.bpeRound(toks("aaaa" -> 1L))
    assert(pair(top) == (("a", "a", 3L)))
    assert(seqOf(merged, "aaaa") == Seq("aa", "aa"))
  }

  test("run-greedy law: odd-length run leaves the tail symbol single") {
    val (_, merged) = ops.TextAnalysis.bpeRound(toks("aaa" -> 2L, "bbbb" -> 1L))
    // top pair is (a,a): count 2x2=4 > (b,b) 3; "aaa" -> [aa, a]
    assert(seqOf(merged, "aaa") == Seq("aa", "a"))
    // the non-winning run is untouched
    assert(seqOf(merged, "bbbb") == Seq("b", "b", "b", "b"))
  }

  test("distinct-symbol merges apply at every candidate site in one pass") {
    // pair (a,b) in "abab": candidates at positions 1 and 3 never
    // conflict (conflict requires a=b), so both merge in one round
    val (top, merged) = ops.TextAnalysis.bpeRound(toks("abab" -> 3L))
    assert(pair(top) == (("a", "b", 6L)))
    assert(seqOf(merged, "abab") == Seq("ab", "ab"))
  }

  test("t23 conservation laws: per-doc bounds and token mass equal to t22's vocabulary") {
    val rows = ops.TextAnalysis.t23.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, words, bpe, chars) =>
      // merges only ever shrink: every word is >= 1 symbol and <= its chars
      assert(bpe >= words && bpe <= chars, s"doc $doc: $words/$bpe/$chars")
    }
    // cross-query conservation: t22's vocab counts are freq-weighted
    // symbol occurrences, so (when the top-30 cap is not binding) their
    // sum IS the corpus BPE token total t23 reports
    val t22Rows = ops.TextAnalysis.t22.run(spark, sf).collect()
    val vocab = t22Rows.filter(_.getString(0) == "vocab").map(_.getLong(3))
    assert(vocab.length < 30, "vocab hit the top-30 cap; law not checkable")
    assert(vocab.sum == rows.map(_._3).sum,
      s"vocab mass ${vocab.sum} != corpus BPE tokens ${rows.map(_._3).sum}")
  }

  test("second round merges composites learned in the first") {
    // round 1 on "abab","abc": (a,b) wins (count 7); round 2 then sees
    // symbol "ab" adjacent to "ab" in "abab" and to "c" in "abc"
    val t0 = toks("abab" -> 3L, "abc" -> 1L)
    val (top1, m1) = ops.TextAnalysis.bpeRound(t0)
    assert(pair(top1) == (("a", "b", 7L)))
    val (top2, m2) = ops.TextAnalysis.bpeRound(m1)
    // (ab,ab) weight 3 vs (ab,c) weight 1 -> (ab,ab)
    assert(pair(top2) == (("ab", "ab", 3L)))
    assert(seqOf(m2, "abab") == Seq("abab"))
    assert(seqOf(m2, "abc") == Seq("ab", "c"))
  }

  test("bpeLearn: 2-round driver output equals the unrolled t22 rounds " +
    "on the corpus; learned counts are non-increasing") {
    val docs = graft.model.Tables.documents(spark, sf)
    val (merges, toksOut, rounds) = ops.TextAnalysis.bpeLearn(docs, 2)
    assert(rounds == 2, s"corpus exhausted early: $rounds")
    // t22's merge rows state the same two winners
    val t22Merges = ops.TextAnalysis.t22.run(spark, sf).collect()
      .filter(_.getString(0) == "merge").sortBy(_.getInt(1))
      .map(r => (r.getString(2), r.getLong(3))).toSeq
    assert(merges.map { case (a, b, c) => (s"$a+$b", c) } == t22Merges,
      s"driver merges ${merges} != t22 ${t22Merges}")
    // and the driver's final table IS the unrolled mg2: same per-symbol
    // mass (the quantity t22's vocab rows digest)
    val (_, m1) = ops.TextAnalysis.bpeRound(
      ops.TextAnalysis.bpeCharToks(docs))
    val (_, m2) = ops.TextAnalysis.bpeRound(m1)
    def mass(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("sym").agg(sum("freq").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass(toksOut) == mass(m2), "driver table diverged from mg2")
    // max-count monotonicity: a new symbol occurs at most count(merge)
    // times, so every later winner's weight is bounded by every earlier
    assert(merges.map(_._3).sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    }, s"learned counts increased: ${merges.map(_._3)}")
  }

  test("bpeLearn: exhaustion stops the loop before the budget on a " +
    "tiny vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // merges available: (a,b) cnt 2, then (c,d) cnt 1 < minFreq floor
    val (merges, _, rounds) = ops.TextAnalysis.bpeLearn(docs, 10)
    assert(rounds == 1 && merges.map(m => (m._1, m._2, m._3)) ==
      Seq(("a", "b", 2L)),
      s"expected one merge then the minFreq floor: $merges")
  }
}

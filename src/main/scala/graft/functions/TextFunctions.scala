package graft.functions

/** Frequency-scored extractive summarisation — the deterministic
  * algorithmic stand-in for the reference's t5-small abstractive
  * summariser (`news-processing/news_summarization_batch.py:52-73`),
  * preserving its length contract: the summary targets
  * `min(100, max(20, words/3))` words (`:66-68`) built from whole
  * sentences.
  *
  * Algorithm: split into sentences; score each sentence by the sum of
  * its words' corpus-free normalised frequencies within the document;
  * greedily take the highest-scoring sentences (original order
  * preserved) until the word budget is met. Deterministic by
  * construction: ties break on sentence position.
  *
  * Runs as a plain Scala function — used via `Dataset.mapPartitions`
  * ([[graft.ops.NewsPipeline]] wires the word-budget head variant as the
  * oracle-checkable query; this one is the faithful-shape variant,
  * exercised by spec and the rows-only query path).
  */
object TextFunctions {

  def sentencesOf(text: String): Array[String] =
    text.split("(?<=[.!?])\\s+").filter(_.nonEmpty)

  def extractiveSummary(text0: String): String = {
    val text = if (text0 == null) "" else text0.take(5000)
    if (text.isEmpty) return ""
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return ""
    val budget = math.min(100, math.max(20, words.length / 3))

    val freq = words.groupBy(_.toLowerCase).map { case (w, ws) =>
      w -> ws.length.toDouble / words.length
    }
    val sentences = sentencesOf(text)
    if (sentences.length <= 1) {
      // no sentence structure (the synthetic corpus) → word-budget head,
      // identical to NewsPipeline.summarize
      return words.take(budget).mkString(" ")
    }
    val scored = sentences.zipWithIndex.map { case (s, i) =>
      val ws = s.split("\\s+").filter(_.nonEmpty)
      val score = ws.map(w => freq.getOrElse(w.toLowerCase, 0.0)).sum
      (i, s, ws.length, score)
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
    var used = 0
    for ((i, _, n, _) <- scored.sortBy { case (i, _, _, sc) => (-sc, i) }
         if used < budget) {
      picked += i
      used += n
    }
    picked.sorted.map(i => sentences(i)).mkString(" ")
  }
}

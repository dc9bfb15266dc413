package graft.functions

/** Frequency-scored extractive summarisation — the deterministic
  * algorithmic stand-in for the reference's t5-small abstractive
  * summariser (`news-processing/news_summarization_batch.py:52-73`),
  * preserving its length contract: the summary targets
  * `min(100, max(20, words/3))` words (`:66-68`) built from whole
  * sentences.
  *
  * Algorithm: split into sentences; score each sentence by the sum of
  * its words' in-document frequencies. The score is kept as the INTEGER
  * Σ count(lower(word)) — dividing each count by the document length N
  * (the textbook normalised form) rescales every sentence of a document
  * by the same 1/N and cannot change the ranking, while integer sums
  * are exact in any engine (the double form's accumulation order is
  * not, which would leave the n10 oracle one ULP from a tie-break
  * flip). Greedily take the highest-scoring sentences (original order
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

  /** Rabin–Karp rolling hashes of every `k`-gram of the byte string:
    * h(i+1) = (h(i) - s[i]·B^(k-1)) · B + s[i+k], all mod 2⁶¹−1 — O(n)
    * total, the primitive under content-defined chunking and winnowing.
    * Base/modulus chosen so intermediate products stay in 63 bits. */
  private final val Mod = (1L << 61) - 1
  private final val Base = 257L
  def rollingHashes(text: String, k: Int): Array[Long] = {
    val s = text.getBytes("UTF-8")
    if (s.length < k) return Array.empty
    var pow = 1L // Base^(k-1) mod Mod
    var i = 0
    while (i < k - 1) { pow = mulMod(pow, Base); i += 1 }
    val out = new Array[Long](s.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (mulMod(h, Base) + (s(i) & 0xffL)) % Mod; i += 1 }
    out(0) = h
    i = 1
    while (i < out.length) {
      h = (h - mulMod(s(i - 1) & 0xffL, pow) % Mod + Mod) % Mod
      h = (mulMod(h, Base) + (s(i + k - 1) & 0xffL)) % Mod
      out(i) = h
      i += 1
    }
    out
  }

  /** 128-bit-safe modular multiply for the 61-bit Mersenne modulus. */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 2^64·hi + lo into mod 2^61-1: 2^61 ≡ 1
    val part = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    val r = (part >>> 61) + (part & Mod)
    if (r >= Mod) r - Mod else r
  }

  /** Oracle k-gram hash family: 60-bit value from the md5 of each k-char
    * substring — first 8 digest bytes big-endian, shifted right 4, i.e.
    * exactly DuckDB's `CAST('0x'||substr(md5(substr(text,i,k)),1,15) AS
    * BIGINT)` — so the t05/t06 winnowing queries carry full DuckDB
    * value/hash oracles. O(n·k) with a digest per gram vs the rolling
    * family's O(n): the oracle tier pays for cross-engine checkability;
    * production runs [[rollingHashes]] (`spark.graft.fasthash`). Char
    * indexing == byte indexing requires 1-byte chars; the corpus is
    * ASCII (multi-byte text would need a byte-substring oracle). */
  def md5KgramHashes(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array.empty
    val md = SimHash64.mdPool.get()
    val out = new Array[Long](text.length - k + 1)
    var i = 0
    while (i < out.length) {
      md.reset()
      val d = md.digest(text.substring(i, i + k).getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    out
  }

  /** Winnowing fingerprint (Schleimer et al.): the min hash of each
    * sliding window of `w` consecutive k-gram hashes, deduplicated — a
    * position-robust document signature: guaranteed to share prints with
    * any document that shares a run of ≥ w+k−1 bytes. The guarantee is
    * structural (it holds for ANY k-gram hash family); `md5Mode` selects
    * the DuckDB-recomputable family ([[md5KgramHashes]]) over the
    * production Rabin–Karp one ([[rollingHashes]]). */
  def winnow(text: String, k: Int = 8, w: Int = 4,
      md5Mode: Boolean = false): Set[Long] = {
    val hs = if (md5Mode) md5KgramHashes(text, k) else rollingHashes(text, k)
    if (hs.isEmpty) return Set.empty
    if (hs.length <= w) return Set(hs.min)
    val out = scala.collection.mutable.Set.empty[Long]
    var i = 0
    while (i + w <= hs.length) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      out += m
      i += 1
    }
    out.toSet
  }

  /** Content-defined chunk spans (LBFS-class): cut AFTER byte p+k−1
    * wherever the k-gram hash at p ≡ 0 (mod `mod`); spans are 1-based
    * `(pos, len)` and tile the text exactly. The boundary predicate is
    * position-local, so spans depend only on the hash FAMILY —
    * `md5Mode` selects the DuckDB-recomputable md5 60-bit heads (the
    * d19 oracle's family) over the production O(n) Rabin–Karp rolling
    * family ([[rollingHashes]]; `spark.graft.fasthash`) — the
    * winnowing precedent ([[winnow]]), applied to chunking. */
  def cdcSpans(text: String, k: Int = 8, mod: Int = 32,
      md5Mode: Boolean = false): Array[(Int, Int)] = {
    val hs = if (md5Mode) md5KgramHashes(text, k) else rollingHashes(text, k)
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < hs.length) {
      if (hs(i) % mod == 0) cuts += (i + 1) + k // 1-based pos after gram
      i += 1
    }
    val starts = 1 +: cuts.toArray
    val ends = cuts.toArray :+ (text.length + 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var j = 0
    while (j < starts.length) {
      if (ends(j) > starts(j)) out += ((starts(j), ends(j) - starts(j)))
      j += 1
    }
    out.toArray
  }

  def extractiveSummary(text0: String): String = {
    val text = if (text0 == null) "" else text0.take(5000)
    if (text.isEmpty) return ""
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return ""
    val budget = math.min(100, math.max(20, words.length / 3))

    // Locale.ROOT: the n10 oracle/parity pin this against Spark/DuckDB
    // lower(), which are locale-invariant — a tr-TR default locale would
    // fold I to dotless ı and silently diverge the freq keys
    val freq = words.groupBy(_.toLowerCase(java.util.Locale.ROOT))
      .map { case (w, ws) => w -> ws.length.toLong }
    val sentences = sentencesOf(text)
    if (sentences.length <= 1) {
      // no sentence structure (the synthetic corpus) → word-budget head,
      // identical to NewsPipeline.summarize
      return words.take(budget).mkString(" ")
    }
    val scored = sentences.zipWithIndex.map { case (s, i) =>
      val ws = s.split("\\s+").filter(_.nonEmpty)
      val score =
        ws.map(w => freq.getOrElse(w.toLowerCase(java.util.Locale.ROOT), 0L)).sum
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

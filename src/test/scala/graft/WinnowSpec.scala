package graft

import graft.functions.TextFunctions
import graft.multimodal.Multimodal

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("rolling hashes: O(n) recurrence equals direct recomputation") {
    val text = "the quick brown fox jumps over the lazy dog"
    val k = 8
    val rolled = TextFunctions.rollingHashes(text, k)
    // direct: hash each k-gram from scratch (rollingHashes of the slice)
    val direct = (0 to text.getBytes("UTF-8").length - k).map { i =>
      TextFunctions.rollingHashes(
        new String(text.getBytes("UTF-8").slice(i, i + k), "ISO-8859-1"), k).head
    }
    assert(rolled.toSeq == direct)
  }

  test("winnowing: shared long runs produce shared fingerprints, both hash families") {
    for (md5Mode <- Seq(false, true)) {
      val shared = "a common run of bytes that is long enough to matter"
      val a = "prefix one " + shared + " suffix alpha"
      val b = "totally different start " + shared + " and another end"
      val c = "no overlap here at all with anything else whatsoever"
      val pa = TextFunctions.winnow(a, md5Mode = md5Mode)
      val pb = TextFunctions.winnow(b, md5Mode = md5Mode)
      val pc = TextFunctions.winnow(c, md5Mode = md5Mode)
      assert(pa.intersect(pb).nonEmpty,
        s"md5Mode=$md5Mode: docs sharing a long run must share prints")
      assert(pa.intersect(pc).isEmpty)
      // deterministic
      assert(pa == TextFunctions.winnow(a, md5Mode = md5Mode))
      // short/empty inputs are safe
      assert(TextFunctions.winnow("", 8, 4, md5Mode).isEmpty)
      assert(TextFunctions.winnow("tiny", 8, 4, md5Mode).isEmpty)
    }
  }

  test("winnowing guarantee holds on random documents (seeded property)") {
    // Schleimer et al.'s theorem: any shared run of ≥ w+k−1 bytes forces
    // a shared print (the window over the run picks the same minimum).
    // Random vocab docs with a random injected shared run exercise far
    // more window/boundary alignments than the fixed fixtures above.
    val rnd = new scala.util.Random(816L)
    val vocabA = Vector("kestrel", "lattice", "orchid", "pumice", "raven")
    val vocabB = Vector("zephyr", "quartz", "willow", "ember", "flint")
    for (trial <- 1 to 20; md5Mode <- Seq(false, true)) {
      // shared run strictly longer than w+k-1 = 11 bytes
      val runWords = 2 + rnd.nextInt(4)
      val shared = Seq.fill(runWords)(vocabA(rnd.nextInt(vocabA.size)) +
        vocabB(rnd.nextInt(vocabB.size))).mkString(" ")
      def doc(v: Vector[String]) =
        Seq.fill(3 + rnd.nextInt(10))(v(rnd.nextInt(v.size))).mkString(" ")
      val a = doc(vocabA) + " " + shared + " " + doc(vocabA)
      val b = doc(vocabB) + " " + shared + " " + doc(vocabB)
      val common = TextFunctions.winnow(a, md5Mode = md5Mode)
        .intersect(TextFunctions.winnow(b, md5Mode = md5Mode))
      assert(common.nonEmpty,
        s"trial $trial md5Mode=$md5Mode: shared ${shared.length}-byte run produced no shared print")
    }
  }

  test("frame sampling: 1->N shape, deterministic real frames") {
    val media = Multimodal.realMediaFrame(model.Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == 500 * 4)
    val f0 = frames.filter(_.doc_id == 0L).collect().sortBy(_.frame_no)
    assert(f0.map(_.frame_no).toSeq == Seq(0, 1, 2, 3))
    assert(f0.forall(f => f.f0 >= 0.0 && f.f0 <= 1.0))
    // determinism: a second pass produces identical frames
    val again = Multimodal.sampleFrames(media, 4)
      .filter(_.doc_id == 0L).collect().sortBy(_.frame_no)
    assert(f0.toSeq == again.toSeq)
  }
}

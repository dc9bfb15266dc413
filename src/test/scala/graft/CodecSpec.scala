package graft

import graft.multimodal.Multimodal._

/** Pins the REAL multimodal codecs (WAV/PPM — no external libs needed):
  * header validation, signal stats, nearest-neighbour pixel mapping, and
  * the additivity law tying frame windows back to the whole clip. */
class CodecSpec extends SparkSpec {

  test("WAV: synth → decode round-trips header + signal invariants") {
    val bytes = syntheticWav(7L)
    assert(bytes.length == 44 + 800 * 2)
    val info = decodeWav(bytes)
    assert(info.sample_rate == 8000)
    assert(info.n_samples == 800)
    // amplitude law: amp(seed) = 4000 + |seed % 8000| bounds the peak
    assert(info.peak > 0 && info.peak <= 4007)
    assert(info.rms > 0 && info.rms < info.peak)
    // bit-determinism (StrictMath): a second synthesis is identical
    assert(java.util.Arrays.equals(bytes, syntheticWav(7L)))
  }

  test("WAV: garbage and non-PCM inputs are rejected, not mis-decoded") {
    intercept[IllegalArgumentException](decodeWav("not a wav at all!!".getBytes
      ++ new Array[Byte](40)))
    val bad = syntheticWav(1L)
    bad(20) = 9 // format tag != 1 (PCM)
    intercept[IllegalArgumentException](decodeWav(bad))
  }

  test("WAV frames: windows partition the clip and recompose its energy") {
    val bytes = syntheticWav(42L)
    val whole = decodeWav(bytes)
    val frames = wavFrames(42L, bytes, 4)
    assert(frames.map(_.n_samples).sum == whole.n_samples)
    assert(frames.map(_.peak).max == whole.peak)
    // energy additivity: Σ n_k·rms_k² = n·rms²  (same squares, different
    // fold grouping → tolerance only for the final rounding)
    val lhs = frames.map(f => f.n_samples * f.rms * f.rms).sum
    val rhs = whole.n_samples * whole.rms * whole.rms
    assert(math.abs(lhs - rhs) / rhs < 1e-9)
  }

  test("PPM: synth → decode, and resize maps nearest-neighbour pixels exactly") {
    val img = syntheticPpm(6L)
    val info = decodePpm(img)
    assert(info.width == 16 && info.height == 12)
    assert(Seq(info.mean_r, info.mean_g, info.mean_b)
      .forall(m => m >= 0 && m <= 255))
    val small = resizePpm(img, 8, 6)
    val sInfo = decodePpm(small)
    assert(sInfo.width == 8 && sInfo.height == 6)
    // nearest-neighbour law: out(x,y) = in(2x, 2y) for a 2× downscale
    val headerIn = "P6\n16 12\n255\n".length
    val headerOut = "P6\n8 6\n255\n".length
    for (y <- Seq(0, 3, 5); x <- Seq(0, 4, 7); c <- 0 until 3)
      assert(small(headerOut + (y * 8 + x) * 3 + c) ==
        img(headerIn + (2 * y * 16 + 2 * x) * 3 + c))
  }

  test("mm04/mm05 run distributed and deterministically") {
    val a1 = graft.multimodal.Multimodal.mm04.run(spark, sf).collect()
    val a2 = graft.multimodal.Multimodal.mm04.run(spark, sf).collect()
    assert(a1.nonEmpty && a1.sameElements(a2))
    val p1 = graft.multimodal.Multimodal.mm05.run(spark, sf).collect()
    assert(p1.nonEmpty)
    assert(p1.forall(r => r.getInt(1) == 8 && r.getInt(2) == 6))
  }
}

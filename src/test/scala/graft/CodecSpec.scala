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
    // LCG samples span the full signed-16-bit range
    assert(info.peak > 0 && info.peak <= 32768)
    assert(info.rms > 0 && info.rms < info.peak)
    // bit-determinism (pure integer LCG): a second synthesis is identical
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

  test("BMP: synth → decode round-trips header + pixel laws") {
    val img = syntheticBmp(6L)
    // 16 px × 3 B = 48 B rows — already 4-byte aligned; 54-byte header
    assert(img.length == 54 + 48 * 12)
    val info = decodeBmp(img)
    assert(info.width == 16 && info.height == 12)
    assert(Seq(info.mean_r, info.mean_g, info.mean_b)
      .forall(m => m >= 0 && m <= 255))
    assert(java.util.Arrays.equals(img, syntheticBmp(6L)))
    // band additivity: the n-band means weighted by band height recompose
    // the whole-image mean ((r+g+b)/3 of the channel means)
    val bands = bmpBandMeans(img, 4)
    assert(bands.length == 4)
    val whole = (info.mean_r + info.mean_g + info.mean_b) / 3.0
    assert(math.abs(bands.sum / 4 - whole) < 1e-9)
    // row padding exercised: a 3-px-wide BMP has 9-byte rows padded to 12
    val odd = syntheticBmp(9L, w = 3, h = 2)
    assert(odd.length == 54 + 12 * 2)
    assert(decodeBmp(odd).width == 3)
  }

  test("BMP: garbage and unsupported variants are rejected") {
    intercept[IllegalArgumentException](decodeBmp(
      "definitely not a bitmap".getBytes ++ new Array[Byte](40)))
    val bad = syntheticBmp(1L)
    bad(28) = 8 // bit count 8 (paletted) — unsupported
    intercept[IllegalArgumentException](decodeBmp(bad))
    val rle = syntheticBmp(2L)
    rle(30) = 1 // BI_RLE8 compression
    intercept[IllegalArgumentException](decodeBmp(rle))
  }

  test("mu-law: companding law, zero fixpoint, container validation") {
    // decode(encode(x)) quantization error is bounded by the segment
    // step (2^(exp+3) ≤ 1024), symmetric in sign, exact at silence
    assert(mulawDecode(mulawEncode(0)) == 0)
    for (x <- Seq(1, 7, 33, 500, 4004, -4004, 17000, -17000, 32000)) {
      val rt = mulawDecode(mulawEncode(x)).toInt
      assert(math.abs(rt - x) <= 1024, s"x=$x rt=$rt")
      // near-silence values may quantize to exactly 0 (x=1 → step 8)
      assert(rt == 0 || rt.sign == x.sign)
    }
    // monotone on the positive axis (companding preserves order)
    val xs = Seq(0, 10, 100, 1000, 10000, 30000)
    val ys = xs.map(x => mulawDecode(mulawEncode(x)).toInt)
    assert(ys == ys.sorted)
    val wav = syntheticMulawWav(5L)
    assert(wav.length == 44 + 800) // 1 byte per sample
    val info = decodeMulawWav(wav)
    assert(info.sample_rate == 8000 && info.n_samples == 800)
    // full-scale LCG signal; companding overshoots by ≤ 1 segment step
    assert(info.peak > 3000 && info.peak <= 32768 + 1024)
    assert(info.rms > 0 && info.rms < info.peak)
    // a PCM16 WAV must not decode through the μ-law path
    intercept[IllegalArgumentException](decodeMulawWav(syntheticWav(5L)))
    // and a μ-law WAV must not decode through the PCM16 path
    intercept[IllegalArgumentException](decodeWav(wav))
  }

  test("mu-law frames: windows recompose the clip energy") {
    val wav = syntheticMulawWav(11L)
    val whole = decodeMulawWav(wav)
    val rms = mulawWindowRms(wav, 4)
    assert(rms.length == 4)
    val lhs = rms.map(r => 200 * r * r).sum // 800 samples / 4 windows
    val rhs = whole.n_samples * whole.rms * whole.rms
    assert(math.abs(lhs - rhs) / rhs < 1e-9)
  }

  test("flip/crop laws: involution, geometry, bounds validation") {
    val img = syntheticPpm(42L)
    // flip is an involution on the pixel payload
    assert(flipPpm(flipPpm(img)).sameElements(img))
    // crop geometry: decoded dims are the requested window
    val crop = decodePpm(cropPpm(img, 4, 3, 8, 6))
    assert(crop.width == 8 && crop.height == 6)
    // full-frame crop is the identity
    assert(cropPpm(img, 0, 0, 16, 12).sameElements(img))
    // flip preserves channel means (same multiset of pixels)
    val (orig, flip) = (decodePpm(img), decodePpm(flipPpm(img)))
    assert(orig.mean_r == flip.mean_r && orig.mean_g == flip.mean_g &&
      orig.mean_b == flip.mean_b)
    // out-of-bounds and degenerate windows are rejected loudly
    intercept[IllegalArgumentException](cropPpm(img, 10, 0, 8, 6))
    intercept[IllegalArgumentException](cropPpm(img, 0, 0, 0, 6))
    // truncated payload rejected before any index walks off the array
    intercept[IllegalArgumentException](flipPpm(img.take(img.length - 1)))
  }

  test("aHash laws: augmentation drift bounded, flip scatters, clamp is real") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val drifts = (0L until 1600L by 8L).map { id =>
      val img = syntheticPpm(id)
      ham(aHashPpm(img), aHashPpm(brightnessPpm(img, 4)))
    }
    // the mm12 margin: augmented copies stay far inside the 7-bit
    // threshold, and at least one pair actually drifts (clamping bites)
    assert(drifts.max <= 4, s"max drift ${drifts.max}")
    assert(drifts.exists(_ > 0))
    // unrelated images sit near the binomial center, never under 7
    val cross = for (i <- 0L until 40L; j <- i + 1 until 40L)
      yield ham(aHashPpm(syntheticPpm(i)), aHashPpm(syntheticPpm(j)))
    assert(cross.min > 7, s"min cross ${cross.min}")
    // a flip reshuffles the grid: aHash is deliberately not flip-invariant
    val img = syntheticPpm(42L)
    assert(ham(aHashPpm(img), aHashPpm(flipPpm(img))) > 7)
    // brightness saturates rather than wraps, and delta=0 is the identity
    val bright = brightnessPpm(img, 200)
    assert(decodePpm(bright).mean_r <= 255.0)
    assert(brightnessPpm(img, 0).sameElements(img))
    val darkest = brightnessPpm(img, -255)
    val dm = decodePpm(darkest)
    assert(dm.mean_r == 0.0 && dm.mean_g == 0.0 && dm.mean_b == 0.0)
  }

  test("mm04/mm05 run distributed and deterministically") {
    val a1 = graft.multimodal.Multimodal.mm04.run(spark, sf).collect()
    val a2 = graft.multimodal.Multimodal.mm04.run(spark, sf).collect()
    assert(a1.nonEmpty && a1.sameElements(a2))
    val p1 = graft.multimodal.Multimodal.mm05.run(spark, sf).collect()
    assert(p1.nonEmpty)
    assert(p1.forall(r => r.getInt(1) == 8 && r.getInt(2) == 6))
  }

  test("gain: identity, sign-split scaling, clip law, header integrity") {
    val pcm = Array[Short](0, 1, -1, 7, -7, 1000, -1000, 32767, -32768)
    val wav = encodeWav(pcm, 8000)
    // identity gain re-encodes byte-identically
    assert(java.util.Arrays.equals(gainWav(wav, 1, 1), wav))
    val (rate, scaled) = wavSamples(gainWav(wav, 3, 2))
    assert(rate == 8000)
    // truncating magnitude scaling: ±7 → ±10 (not -11), ±1 → ±1
    assert(scaled.toSeq == Seq[Short](0, 1, -1, 10, -10, 1500, -1500,
      32767, -32768))
    // hard clip at the PCM16 rails (samples with |s| >= 1000 all saturate)
    val (_, loud) = wavSamples(gainWav(wav, 100, 1))
    assert(loud.toSeq.drop(5).forall(s => s == 32767 || s == -32768))
    intercept[IllegalArgumentException](gainWav(wav, 0, 1))
  }

  test("decimate: sample indexing law, rate division, validation") {
    val pcm = Array.tabulate[Short](11)(i => (i * 100).toShort)
    val wav = encodeWav(pcm, 8000)
    val (rate, kept) = wavSamples(decimateWav(wav, 2))
    assert(rate == 4000)
    assert(kept.toSeq == Seq[Short](0, 200, 400, 600, 800, 1000))
    // decimated output is itself a valid decodable WAV (re-encode law)
    val info = decodeWav(decimateWav(wav, 2))
    assert(info.n_samples == 6 && info.sample_rate == 4000)
    // truncated payload is rejected, not mis-read
    intercept[IllegalArgumentException](
      wavSamples(wav.dropRight(2)))
    intercept[IllegalArgumentException](decimateWav(wav, 0))
  }

  test("mm08 runs distributed, deterministic, and matches local pipeline") {
    val a1 = graft.multimodal.Multimodal.mm08.run(spark, sf).collect()
    val a2 = graft.multimodal.Multimodal.mm08.run(spark, sf).collect()
    assert(a1.nonEmpty && a1.sameElements(a2))
    assert(a1.forall(r => r.getInt(1) == 4000 && r.getInt(2) == 400))
    // spot-check one doc against the local composition
    val id = a1.head.getLong(0)
    val info = decodeWav(decimateWav(gainWav(syntheticWav(id), 3, 2), 2))
    assert(a1.head.getInt(3) == info.peak && a1.head.getDouble(4) == info.rms)
  }

  // ---------------------------------------------------------- PNG codec
  import graft.multimodal.Png

  private def lcgPixels(seed: Long, n: Int): Array[Byte] = {
    var state = seed * 6364136223846793005L + 1442695040888963407L
    Array.fill(n) {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 56).toByte
    }
  }

  test("png: encode→decode is bit-exact, including edge geometries") {
    // h ≥ 5 exercises ALL five filter reconstruction paths (encoder
    // cycles filter type y % 5); 1×1 and single-row/column pin the
    // left/up boundary conditions where the predictors read zeros
    for ((w, h) <- Seq((16, 12), (1, 1), (7, 1), (1, 9), (5, 5), (33, 7))) {
      val px = lcgPixels(w.toLong * 1000 + h, w * h * 3)
      val img = Png.decode(Png.encode(px, w, h))
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(px), s"pixels differ at ${w}x$h")
    }
  }

  test("png: a flipped payload byte fails the CRC check loudly") {
    val px = lcgPixels(42L, 16 * 12 * 3)
    val bytes = Png.encode(px, 16, 12)
    // find the first IDAT chunk and corrupt one data byte
    var pos = 8
    var idat = -1
    while (idat < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      if (tpe == "IDAT") idat = pos else pos += 12 + len
    }
    val corrupted = bytes.clone()
    corrupted(idat + 8) = (corrupted(idat + 8) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Png.decode(corrupted))
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }

  test("png: unsupported shapes and truncation are rejected, never misread") {
    val good = Png.encode(lcgPixels(7L, 4 * 3 * 3), 4, 3)
    // grayscale color type (patched IHDR + recomputed CRC) must refuse
    val gray = good.clone()
    gray(8 + 8 + 9) = 0.toByte // color-type byte inside IHDR data
    val crc = new java.util.zip.CRC32
    crc.update(gray, 12, 4 + 13) // chunk type + IHDR data
    java.nio.ByteBuffer.wrap(gray, 12 + 4 + 13, 4).putInt(crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](Png.decode(gray))
    assert(e.getMessage.contains("unsupported"), e.getMessage)
    // bad signature and truncated stream both fail loudly
    intercept[IllegalArgumentException](Png.decode(good.drop(1)))
    intercept[IllegalArgumentException](Png.decode(good.dropRight(13)))
  }

  test("gif: LZW round-trip is byte-lossless across code-width regimes") {
    import graft.multimodal.Gif
    def lcgPlane(seed: Long, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var state = seed
      var i = 0
      while (i < n) {
        state = state * 6364136223846793005L + 1442695040888963407L
        out(i) = (state >>> 56).toByte
        i += 1
      }
      out
    }
    // catalog geometry: 9-bit codes only
    val small = lcgPlane(7, 16 * 12)
    assert(java.util.Arrays.equals(
      Gif.decode(Gif.encode(small, 16, 12)).indices, small))
    // constant plane: the KwKwK chain (code == decoder's next slot) on
    // every step after the first
    val const = Array.fill(16 * 12)(42.toByte)
    assert(java.util.Arrays.equals(
      Gif.decode(Gif.encode(const, 16, 12)).indices, const))
    // large high-entropy plane: crosses 9→10→11→12-bit widths and the
    // 4096-entry table reset (random bytes miss the dict almost every
    // step, so 12288 pixels assign well past 4096 codes)
    val big = lcgPlane(99, 128 * 96)
    val bigImg = Gif.decode(Gif.encode(big, 128, 96))
    assert(bigImg.width == 128 && bigImg.height == 96)
    assert(java.util.Arrays.equals(bigImg.indices, big))
    // a repetitive plane stresses long dictionary chains instead
    val rep = Array.tabulate(64 * 64)(i => (i % 7).toByte)
    assert(java.util.Arrays.equals(
      Gif.decode(Gif.encode(rep, 64, 64)).indices, rep))
  }

  test("gif: malformed containers are rejected, not mis-decoded") {
    import graft.multimodal.Gif
    val good = Gif.encode(Array.tabulate(16 * 12)(_.toByte), 16, 12)
    // wrong magic
    intercept[IllegalArgumentException](Gif.decode(good.drop(1)))
    // truncated: trailer gone
    intercept[IllegalArgumentException](Gif.decode(good.dropRight(1)))
    // geometry contract
    intercept[IllegalArgumentException](Gif.encode(new Array[Byte](10), 16, 12))
    // pixel-count mismatch: the LZW stream carries 16×12 pixels but the
    // container claims 16×13 — patch BOTH height fields (LSD height LE
    // at offset 8; image-descriptor height at 6+7+768+1+4+2 = 788) so
    // framing passes and the decoder must catch it at the pixel count
    val claims = Gif.encode(Array.tabulate(16 * 12)(_.toByte), 16, 12)
    claims(8) = 13.toByte
    claims(788) = 13.toByte
    intercept[IllegalArgumentException](Gif.decode(claims))
  }

  test("mm14: matched filter finds every planted tone with quantified margin") {
    import graft.multimodal.Multimodal
    val rows = Multimodal.mm14.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(rows.nonEmpty)
    // all four periods are actually planted across the corpus
    assert(rows.map(_._2).toSet == Set(8L, 10L, 16L, 20L))
    var worstMargin = Double.MaxValue
    rows.foreach { case (id, truth, detected, scores) =>
      assert(detected == truth, s"doc $id: detected $detected != $truth")
      // the winner's score is the full-correlation sum: n*amp plus the
      // noise correlation, which is bounded by n*2048
      val winner = scores(Multimodal.TonePeriods.indexOf(truth.toInt))
      assert(winner == scores.max)
      val nAmp = Multimodal.ToneSamples.toLong * Multimodal.ToneAmp
      val noiseBound = Multimodal.ToneSamples.toLong * 2048
      assert(math.abs(winner - nAmp) <= noiseBound,
        s"doc $id: winner $winner implausibly far from $nAmp")
      val runnerUp = scores.patch(
        Multimodal.TonePeriods.indexOf(truth.toInt), Nil, 1).max
      if (runnerUp > 0) worstMargin =
        math.min(worstMargin, winner.toDouble / runnerUp)
    }
    info(f"worst winner/runner-up margin: $worstMargin%.1fx")
    // near-orthogonal templates: detection must not hinge on a tie
    assert(worstMargin >= 3.0, f"margin $worstMargin%.1fx too thin")
    // decode really round-trips the container: tamper the magic
    val bad = Multimodal.syntheticToneWav(1L)
    bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.detectTone(bad))
  }

  test("mm15 sobel: flat image is edgeless; a vertical step responds in Gx only") {
    import graft.multimodal.Multimodal
    def ppm(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        out(header.length + (y * w + x) * 3 + c) = pix(x, y).toByte
      out
    }
    // constant image: every neighborhood cancels
    val (e0, m0, _, _) = Multimodal.sobelPpm(ppm(16, 12)((_, _) => 77))
    assert(e0 == 0L && m0 == 0L)
    // vertical step at x=8, step 10 per channel -> gray step 30:
    // |Gx| = 4*30 on the two columns flanking the edge, Gy = 0 everywhere
    val (e1, m1, mx, _) =
      Multimodal.sobelPpm(ppm(16, 12)((x, _) => if (x < 8) 40 else 50))
    assert(m1 == 120L, s"step response $m1")
    assert(mx == 7, "argmax ties to the min x flanking column")
    // 2 columns x 10 interior rows at 120 each
    assert(e1 == 2L * 10L * 120L, s"energy $e1")
    // energy is invariant under the horizontal flip (mirror symmetry)
    val flipped = Multimodal.flipPpm(ppm(16, 12)((x, _) => if (x < 8) 40 else 50))
    val (e2, m2, _, _) = Multimodal.sobelPpm(flipped)
    assert(e2 == e1 && m2 == m1)
  }

  test("mm16 equalization laws: constant, full-stretch, monotone") {
    import graft.multimodal.Multimodal
    def ppm(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        out(header.length + (y * w + x) * 3 + c) = pix(x, y).toByte
      out
    }
    // constant image: one level, maps to 0 by convention
    val (lb0, la0, mn0, mx0, sum0) =
      Multimodal.equalizePpm(ppm(16, 12)((_, _) => 100))
    assert((lb0, la0, mn0, mx0, sum0) == ((1L, 1L, 0L, 0L, 0L)))
    // any 2+-level image stretches to the full [0, 255] range
    val (lb1, la1, mn1, mx1, _) =
      Multimodal.equalizePpm(ppm(16, 12)((x, _) => if (x < 8) 40 else 200))
    assert(lb1 == 2L && la1 == 2L && mn1 == 0L && mx1 == 255L)
    // monotone: on a 4-level gradient the remapped levels keep their order
    val levels = Array(10, 60, 120, 240)
    val (lb2, la2, mn2, mx2, _) =
      Multimodal.equalizePpm(ppm(16, 12)((x, _) => levels(x / 4)))
    assert(lb2 == 4L && la2 == 4L && mn2 == 0L && mx2 == 255L)
    // and the corpus run agrees with the codec on a real synthetic image
    val direct = Multimodal.equalizePpm(Multimodal.syntheticPpm(42L))
    assert(direct._3 == 0L && direct._4 == 255L,
      s"random 192-pixel image should span the full range: $direct")
  }

  test("resampleWav laws: identity, rate, copies, midpoints, decimation") {
    import graft.multimodal.Multimodal
    val wav = Multimodal.syntheticWav(7L, nSamples = 100)
    val (rate, s) = Multimodal.wavSamples(wav)
    // identity: num = den reproduces the signal and the rate exactly
    val (idRate, idS) = Multimodal.wavSamples(
      Multimodal.resampleWav(wav, 5, 5))
    assert(idRate == rate && idS.sameElements(s))
    // 3/2 upsample: length + rate law, and every r=0 position copies
    val (upRate, up) = Multimodal.wavSamples(
      Multimodal.resampleWav(wav, 3, 2))
    assert(upRate == rate * 3 / 2 && up.length == s.length * 3 / 2)
    (0 until up.length by 3).foreach { j =>
      assert(up(j) == s(j * 2 / 3), s"copy position $j")
    }
    // 2/1 upsample: odd positions are exact truncated midpoints
    val (_, dbl) = Multimodal.wavSamples(Multimodal.resampleWav(wav, 2, 1))
    (0 until s.length - 1).foreach { k =>
      val t = s(k).toLong + s(k + 1)
      val mid = if (t < 0) -((-t) / 2) else t / 2
      assert(dbl(2 * k) == s(k) && dbl(2 * k + 1) == mid.toShort)
    }
    // last-sample hold: the final interpolation clamps to s.last
    assert(dbl.last == s.last)
    // 1/2 downsample degenerates to decimation (r is always 0)
    val (_, half) = Multimodal.wavSamples(Multimodal.resampleWav(wav, 1, 2))
    val (_, dec) = Multimodal.wavSamples(Multimodal.decimateWav(wav, 2))
    assert(half.sameElements(dec))
    // interpolation never leaves the input envelope
    assert(up.max <= s.max && up.min >= s.min)
  }

  test("mm18: patchify tiles exactly — conservation, coverage, raster order") {
    for (id <- Seq(0L, 2L, 4L, 1234L)) {
      val img = syntheticPpm(id)
      val patches = patchifyPpm(img)
      // coverage: (16/4)×(12/4) patches, raster order
      assert(patches.size == 12)
      assert(patches.map(p => (p._1, p._2)) ==
        (for (r <- 0 until 3; c <- 0 until 4) yield (r, c)))
      // conservation: patch sums partition the whole-image gray sum —
      // a tiling that drops/duplicates a pixel breaks this
      val off = img.length - 16 * 12 * 3
      val total = (0 until 16 * 12).map { p =>
        (((img(off + p * 3) & 0xff) + (img(off + p * 3 + 1) & 0xff) +
          (img(off + p * 3 + 2) & 0xff)) / 3).toLong
      }.sum
      assert(patches.map(_._3).sum == total)
      // mean is the exact floor of sum over the patch area
      patches.foreach(p => assert(p._4 == p._3 / 16))
    }
  }

  test("mm19: DCT spectrum — DC law, DC dominance, AC flatness") {
    val rows = multimodal.Multimodal.mm19.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 64)
    // DC law: F[0,0] = 4096² · Σ gray over the block, so the corpus
    // sum_abs at (0,0) equals 4096² times the recomputed gray mass of
    // rows 0–7 across the selected docs
    val ids = model.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 1)
      .select("doc_id").collect().map(_.getLong(0))
    val grayMass = ids.map { id =>
      val img = multimodal.Multimodal.syntheticPpm(id)
      val off = img.length - 16 * 12 * 3
      (0 until 16 * 8).map { p =>
        val y = p / 16; val x = p % 16
        val q = off + (y * 16 + x) * 3
        ((img(q) & 0xff) + (img(q + 1) & 0xff) + (img(q + 2) & 0xff)).toLong
      }.sum
    }.sum
    assert(rows((0L, 0L))._1 == 4096L * 4096L * grayMass, "DC law")
    // DC dominance: non-negative pixels concentrate mass at (0,0)
    val dc = rows((0L, 0L))._3
    val ac = rows.filter(_._1 != (0L, 0L)).values.map(_._3)
    assert(dc > 20 * ac.max, s"DC $dc vs max AC ${ac.max}")
    // AC flatness: white-noise pixels → no AC frequency stands out
    // (max within 3× of min — there is nothing spatial to compact,
    // which is why codecs transform residuals, not raw noise)
    assert(ac.max <= 3 * math.max(1L, ac.min),
      s"AC spread ${ac.min}..${ac.max}")
    // shares are a partition of (almost) the whole ppm scale
    val total = rows.values.map(_._3).sum
    assert(total <= 1000000L && total >= 1000000L - 64)
  }

  test("mm20: quant+zigzag RLE equals a per-block driver recompute; RLE laws") {
    val got = multimodal.Multimodal.mm20.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val quant = Array(
      Array(16L, 11, 10, 16, 24, 40, 51, 61), Array(12L, 12, 14, 19, 26, 58, 60, 55),
      Array(14L, 13, 16, 24, 40, 57, 69, 56), Array(14L, 17, 22, 29, 51, 87, 80, 62),
      Array(18L, 22, 37, 56, 68, 109, 103, 77), Array(24L, 35, 55, 64, 81, 104, 113, 92),
      Array(49L, 64, 78, 87, 103, 121, 120, 101), Array(72L, 92, 95, 98, 112, 100, 103, 99))
    val zig = Array(
      Array(0, 1, 5, 6, 14, 15, 27, 28), Array(2, 4, 7, 13, 16, 26, 29, 42),
      Array(3, 8, 12, 17, 25, 30, 41, 43), Array(9, 11, 18, 24, 31, 40, 44, 53),
      Array(10, 19, 23, 32, 39, 45, 52, 54), Array(20, 22, 33, 38, 46, 51, 55, 60),
      Array(21, 34, 37, 47, 50, 56, 59, 61), Array(35, 36, 48, 49, 57, 58, 62, 63))
    val ids = model.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.expr("doc_id % 4 = 1"))
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.keySet == ids.flatMap(id => Seq((id, 0L), (id, 1L))).toSet)
    for (id <- ids; blk <- 0 to 1) {
      val nzZz = multimodal.Multimodal
        .dctBlocks(multimodal.Multimodal.syntheticPpm(id))
        .filter(_._1 == blk)
        .map { case (_, u, v, f) =>
          val d = quant(u)(v) * 16777216L
          val q = if (f >= 0) f / d else -((-f) / d)
          (zig(u)(v), q)
        }
        .filter(_._2 != 0L).map(_._1).sorted
      val exp =
        if (nzZz.isEmpty) (0L, -1L, 64L)
        else {
          val gaps = (-1 +: nzZz).sliding(2).map { case Seq(a, b) => b - a - 1 }
          (nzZz.length.toLong, nzZz.last.toLong,
            math.max(gaps.max, 63 - nzZz.last).toLong)
        }
      assert(got((id, blk.toLong)) == exp, s"block ($id, $blk)")
    }
    // RLE laws: zero mass bounds the longest run; empty-block coherence
    got.values.foreach { case (nnz, eob, run) =>
      assert(nnz >= 0 && nnz <= 64 && eob >= -1 && eob <= 63)
      assert(run <= 64 - nnz, s"run $run exceeds zero mass ${64 - nnz}")
      assert((nnz == 0) == (eob == -1))
    }
    // DC survives quantisation on every block of this corpus (mm19's
    // DC-dominance note made quantitative)
    assert(got.values.forall(_._1 >= 1), "a block lost its DC coefficient")
  }
}

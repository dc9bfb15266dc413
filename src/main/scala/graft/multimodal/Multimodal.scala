package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Multimodal-column plumbing (north-star requirement; ref: absent).
  *
  * Media is modelled as opaque `BINARY` content plus typed metadata —
  * the schema a 100 TB image/audio corpus would use (content possibly an
  * object-store pointer at real scale; here inline bytes). The
  * decode/feature-extract step runs as `mapPartitions` over an iterator
  * of rows — the Scala analogue of the reference's `mapInPandas` batch
  * shape (`news_categorization_streaming.py:109`): per-partition
  * initialisation happens once (where a real decoder would load codecs /
  * a model), then rows stream through.
  *
  * All four codec paths are REAL, library-free decoders of standard
  * public formats: PCM16 WAV + binary PPM (mm04–mm06) and 24-bit BMP +
  * G.711 μ-law WAV (mm02/mm03) — header validation, padded/bottom-up
  * pixel indexing, logarithmic companding, per-window signal stats.
  * Synthesis is deterministic pure-integer LCG arithmetic, so every
  * payload is recomputable bit-exactly in DuckDB (HUGEINT wrap-around)
  * and ALL multimodal queries are full-oracle — pixels, PCM samples,
  * and the μ-law companding roundtrip alike.
  * Since r6 a fifth codec is COMPRESSED for real: baseline PNG
  * ([[Png]], mm09) — zlib inflation and all five scanline filters on
  * nothing but JDK primitives (Deflater/Inflater/CRC32). Heavyweight
  * DCT/psychoacoustic codecs (JPEG/MP3) stay out of scope — their
  * libraries don't exist in this container — but the five real formats
  * now exercise every decode concern including entropy-coded payloads
  * (container parse, row padding, byte-order, companding, compression).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      f0: Double, f1: Double, f2: Double, f3: Double)

  /** Synthesize a media table from documents: content bytes are the
    * UTF-8 of the text's md5 (opaque, deterministic); modality alternates
    * by id. Identical construction exists in DuckDB for the oracle. */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
      md5(col("text")).cast("binary").as("content"))

  /** Media table with REAL payloads: image docs carry a valid 24-bit
    * BMP, audio docs a valid G.711 μ-law WAV — both seed-derived and
    * deterministic, both decoded for real downstream (mm02/mm03). */
  def realMediaFrame(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select("doc_id").as[Long].map { id =>
      if (id % 2 == 0) MediaRow(id, "image", syntheticBmp(id))
      else MediaRow(id, "audio", syntheticMulawWav(id))
    }
  }

  /** Feature extraction as a per-partition iterator transform, with a
    * REAL decode per modality: BMP header/pixel decode for images
    * (f0..f3 = width, height, mean red, mean blue), μ-law WAV decode for
    * audio (f0..f3 = sample rate, sample count, linear peak, linear
    * RMS). The per-partition closure is the init point where heavyweight
    * codecs would load once. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.content.length.toLong
        if (r.media_type == "image") {
          val info = decodeBmp(r.content)
          MediaFeatures(r.doc_id, r.media_type, n,
            info.width, info.height, info.mean_r, info.mean_b)
        } else {
          val info = decodeMulawWav(r.content)
          MediaFeatures(r.doc_id, r.media_type, n,
            info.sample_rate, info.n_samples, info.peak, info.rms)
        }
      }
    }
  }

  case class Frame(doc_id: Long, frame_no: Int, n_bytes: Long, f0: Double)

  /** Frame sampling as the 1→N iterator transform (the reference's UDTF
    * shape generalised), decoding for REAL per modality: images split
    * into `n` horizontal pixel bands (f0 = band mean / 255), audio into
    * `n` sample windows over the μ-law-decoded linear signal (f0 =
    * window RMS / 32768) — both in [0, 1]. flatMap keeps the operator
    * streaming — no per-document materialisation. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val bytes = r.content.length.toLong
      val feats =
        if (r.media_type == "image") bmpBandMeans(r.content, n).map(_ / 255.0)
        else mulawWindowRms(r.content, n).map(_ / 32768.0)
      feats.iterator.zipWithIndex.map { case (f, k) =>
        Frame(r.doc_id, k, bytes, f)
      }
    }
  }

  // ------------------------------------------------------ real codecs
  // None of these formats needs a library — WAV is a 44-byte header
  // over PCM16LE, PPM (P6) an ASCII header over RGB bytes, BMP a
  // fixed LE header over padded bottom-up BGR rows, μ-law a public
  // 8-bit companding table — so the engine decodes all of them FOR
  // REAL: header validation, sample/pixel math, resize, frame windows.

  /** Valid mono PCM16LE WAV: RIFF/fmt/data chunks over seed-derived LCG
    * samples (bits 48..63 of the same 64-bit LCG [[syntheticPpm]] uses,
    * reinterpreted signed). Pure integer arithmetic — unlike a trig
    * tone, a DuckDB oracle recomputes the identical signal bit-exactly
    * in HUGEINT (mm04/mm06), the scheme mm05 proved out for pixels. */
  def syntheticWav(seed: Long, nSamples: Int = 800,
      sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var state = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < nSamples) {
      state = state * 6364136223846793005L + 1442695040888963407L
      buf.putShort((state >>> 48).toShort)
      i += 1
    }
    buf.array()
  }

  case class WavInfo(sample_rate: Int, n_samples: Int, peak: Int, rms: Double)

  /** Real WAV decode: validates RIFF/WAVE magic, reads the fmt chunk,
    * and computes peak + RMS over the PCM samples. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE", "not a WAV")
    require(ascii(12, 4) == "fmt " && buf.getShort(20) == 1, "not PCM")
    val sampleRate = buf.getInt(24)
    val bits = buf.getShort(34)
    require(bits == 16, s"expected PCM16, got $bits-bit")
    require(ascii(36, 4) == "data", "missing data chunk")
    val dataLen = buf.getInt(40)
    require(dataLen >= 0 && 44L + dataLen <= bytes.length,
      "truncated PCM payload")
    val n = dataLen / 2
    var peak = 0
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val s = buf.getShort(44 + 2 * i).toInt
      if (math.abs(s) > peak) peak = math.abs(s)
      sumSq += s.toDouble * s
      i += 1
    }
    WavInfo(sampleRate, n, peak, math.sqrt(sumSq / math.max(n, 1)))
  }

  case class AudioFrame(doc_id: Long, frame_no: Int, n_samples: Int,
      peak: Int, rms: Double)

  /** Real audio frame sampling: split the PCM payload into `n` windows,
    * per-window peak + RMS — the 1→N UDTF shape with actual signal
    * math. */
  def wavFrames(docId: Long, bytes: Array[Byte], n: Int): Seq[AudioFrame] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val total = buf.getInt(40) / 2
    // total >= 0 mirrors decodeWav's dataLen guard: a negative declared
    // length would otherwise pass the truncation check and emit
    // fabricated silent frames instead of failing validation
    require(total >= 0 && 44L + 2L * total <= bytes.length,
      "truncated PCM payload")
    val per = math.max(total / n, 1)
    (0 until n).map { k =>
      val from = k * per
      val until = if (k == n - 1) total else math.min((k + 1) * per, total)
      var peak = 0
      var sumSq = 0.0
      var i = from
      while (i < until) {
        val s = buf.getShort(44 + 2 * i).toInt
        if (math.abs(s) > peak) peak = math.abs(s)
        sumSq += s.toDouble * s
        i += 1
      }
      AudioFrame(docId, k, until - from, peak,
        math.sqrt(sumSq / math.max(until - from, 1)))
    }
  }

  /** Re-encode PCM16 samples as a valid mono WAV — shared by the audio
    * augmentation stages so every stage consumes a real codec payload
    * (the audio analogue of [[flipPpm]]/[[cropPpm]] re-encoding PPMs). */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Header-validated PCM16 payload extraction — the decode half the
    * augmentation stages build on (same guards as [[decodeWav]]). */
  def wavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE", "not a WAV")
    require(ascii(12, 4) == "fmt " && buf.getShort(20) == 1, "not PCM")
    require(buf.getShort(34) == 16, "expected PCM16")
    require(ascii(36, 4) == "data", "missing data chunk")
    val dataLen = buf.getInt(40)
    require(dataLen >= 0 && 44L + dataLen <= bytes.length,
      "truncated PCM payload")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(44 + 2 * i); i += 1 }
    (buf.getInt(24), out)
  }

  /** Integer-rational gain (num/den) with clip to the PCM16 range.
    * Magnitude is scaled sign-split so Java's truncating division and
    * DuckDB's floor division agree (both see a non-negative dividend). */
  def gainWav(bytes: Array[Byte], num: Int, den: Int): Array[Byte] = {
    require(num > 0 && den > 0, "gain must be a positive rational")
    val (rate, s) = wavSamples(bytes)
    val out = s.map { v =>
      val a = math.abs(v.toInt).toLong * num / den
      (if (v < 0) -math.min(a, 32768L) else math.min(a, 32767L)).toShort
    }
    encodeWav(out, rate)
  }

  /** Keep every k-th sample, dividing the sample rate with it — the
    * indexing stage of a resampler (no anti-alias filter; that would be
    * the convolution stage a real DSP chain adds before this one). */
  def decimateWav(bytes: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 1, s"decimation factor must be >= 1, got $k")
    val (rate, s) = wavSamples(bytes)
    val out = Array.range(0, s.length, k).map(s(_))
    encodeWav(out, rate / k)
  }

  /** Linear-interpolation sample-rate conversion by the rational
    * `num/den` (the polyphase resampler's arithmetic core; a production
    * chain adds an anti-alias convolution before it — [[decimateWav]]'s
    * scaladoc note, upgraded from index-selection to interpolation).
    * Output sample j sits at input position `j·den/num`: split into
    * integer part i and remainder r, the sample is the EXACT integer
    * convex combination `(s[i]·(num−r) + s[i+1]·r) / num` with the
    * final division truncated toward zero via the sign-split that keeps
    * Java and SQL floor-division in agreement ([[gainWav]]'s trick).
    * The last input sample clamps the i+1 lookup (hold extrapolation).
    * Interpolation never leaves [min(s), max(s)], so no clipping stage
    * is needed. */
  def resampleWav(bytes: Array[Byte], num: Int, den: Int): Array[Byte] = {
    require(num > 0 && den > 0, "resample ratio must be a positive rational")
    val (rate, s) = wavSamples(bytes)
    val nOut = (s.length.toLong * num / den).toInt
    val out = new Array[Short](nOut)
    var j = 0
    while (j < nOut) {
      val posNum = j.toLong * den
      val i = (posNum / num).toInt
      val r = posNum % num
      val s1 = s(math.min(i + 1, s.length - 1))
      val t = s(i).toLong * (num - r) + s1.toLong * r
      out(j) = (if (t < 0) -((-t) / num) else t / num).toShort
      j += 1
    }
    encodeWav(out, (rate.toLong * num / den).toInt)
  }

  /** Valid binary PPM (P6): ASCII header + seed-derived RGB bytes (LCG,
    * deterministic). */
  def syntheticPpm(seed: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var state = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < w * h * 3) {
      state = state * 6364136223846793005L + 1442695040888963407L
      out(header.length + i) = (state >>> 56).toByte
      i += 1
    }
    out
  }

  case class PpmInfo(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  private def ppmHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    // P6\n<w> <h>\n<max>\n — parse the three ASCII ints after the magic
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (pos < bytes.length && !Character.isDigit(bytes(pos))) pos += 1
      require(pos < bytes.length, "truncated PPM header: missing dimension/maxval")
      var x = 0
      while (pos < bytes.length && Character.isDigit(bytes(pos))) {
        x = x * 10 + (bytes(pos) - '0'); pos += 1
      }
      vals(v) = x; v += 1
    }
    (vals(0), vals(1), pos + 1) // +1: single whitespace after maxval
  }

  /** Real PPM decode: header parse + exact per-channel means (integer
    * sums divided once). */
  def decodePpm(bytes: Array[Byte]): PpmInfo = {
    val (w, h, off) = ppmHeader(bytes)
    val sums = new Array[Long](3)
    var i = 0
    val n = w * h
    while (i < n * 3) {
      sums(i % 3) += bytes(off + i) & 0xff
      i += 1
    }
    PpmInfo(w, h, sums(0).toDouble / n, sums(1).toDouble / n,
      sums(2).toDouble / n)
  }

  /** Real nearest-neighbour PPM resize: out(x,y) = in(x·w/w2, y·h/h2),
    * re-encoded as a valid PPM. */
  def resizePpm(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val (w, h, off) = ppmHeader(bytes)
    val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h2) {
      val sy = y * h / h2
      var x = 0
      while (x < w2) {
        val sx = x * w / w2
        var c = 0
        while (c < 3) {
          out(header.length + (y * w2 + x) * 3 + c) =
            bytes(off + (sy * w + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real horizontal mirror: out(x,y) = in(w−1−x, y), re-encoded as a
    * valid PPM — the canonical augmentation flip. */
  def flipPpm(bytes: Array[Byte]): Array[Byte] = {
    val (w, h, off) = ppmHeader(bytes)
    require(off + w.toLong * h * 3 <= bytes.length, "truncated PPM payload")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          out(header.length + (y * w + x) * 3 + c) =
            bytes(off + (y * w + (w - 1 - x)) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real crop: out(x,y) = in(x0+x, y0+y), bounds-checked against the
    * header, re-encoded as a valid PPM. */
  def cropPpm(bytes: Array[Byte], x0: Int, y0: Int,
      w2: Int, h2: Int): Array[Byte] = {
    val (w, h, off) = ppmHeader(bytes)
    require(x0 >= 0 && y0 >= 0 && w2 > 0 && h2 > 0 &&
      x0 + w2 <= w && y0 + h2 <= h, s"crop ($x0,$y0,$w2,$h2) outside ${w}x$h")
    require(off + w.toLong * h * 3 <= bytes.length, "truncated PPM payload")
    val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var c = 0
        while (c < 3) {
          out(header.length + (y * w2 + x) * 3 + c) =
            bytes(off + ((y0 + y) * w + (x0 + x)) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real brightness augmentation: every channel byte lifted by `delta`,
    * SATURATING at 255 (the clamp is what makes augmented copies drift
    * from their source by more than a constant), re-encoded as a valid
    * PPM. */
  def brightnessPpm(bytes: Array[Byte], delta: Int): Array[Byte] = {
    val (w, h, off) = ppmHeader(bytes)
    require(off + w.toLong * h * 3 <= bytes.length, "truncated PPM payload")
    val out = java.util.Arrays.copyOf(bytes, bytes.length)
    var i = off
    while (i < off + w * h * 3) {
      out(i) = math.min(math.max((bytes(i) & 0xff) + delta, 0), 255).toByte
      i += 1
    }
    out
  }

  /** Perceptual average-hash (aHash) of a PPM: nearest-neighbour
    * downsample to an 8×8 grid, integer grayscale per cell
    * (r+g+b, no division), bit i set iff cell i is strictly brighter
    * than the grid mean — compared integer-exactly as
    * `gray·64 > Σgray`, so both engines derive identical bits with no
    * float in the path. Near-identical images (small global edits,
    * light augmentation) land within a few bits; unrelated images sit
    * near the binomial center ~32 — the contrast mm12's threshold
    * rides on. */
  def aHashPpm(bytes: Array[Byte]): Long = {
    val (w, h, off) = ppmHeader(bytes)
    require(off + w.toLong * h * 3 <= bytes.length, "truncated PPM payload")
    val gray = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val sx = x * w / 8
        val p = off + (sy * w + sx) * 3
        val gq = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
          (bytes(p + 2) & 0xff)
        gray(y * 8 + x) = gq
        total += gq
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (gray(i) * 64L > total) hash |= (1L << i)
      i += 1
    }
    hash
  }

  // ---- BMP (Windows 3.x, 24-bit BI_RGB) ------------------------------
  // 14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up BGR rows
  // padded to 4 bytes — the standard public layout, no library needed.

  /** Valid 24-bit uncompressed BMP: seed-derived pixels (same LCG as
    * [[syntheticPpm]]), rows bottom-up and 4-byte padded per spec. */
  def syntheticBmp(seed: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0) // BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var state = seed * 6364136223846793005L + 1442695040888963407L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w * 3) {
        state = state * 6364136223846793005L + 1442695040888963407L
        buf.put(54 + y * rowSize + x, (state >>> 56).toByte)
        x += 1
      }
      y += 1 // padding bytes stay zero
    }
    buf.array()
  }

  case class BmpInfo(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Real BMP decode: magic/header/compression validation, bottom-up
    * padded-row indexing, exact per-channel means (BGR byte order). */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP")
    require(buf.getInt(14) == 40, "expected BITMAPINFOHEADER")
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(h > 0, "top-down BMP unsupported")
    require(buf.getShort(28) == 24, "expected 24-bit pixels")
    require(buf.getInt(30) == 0, "expected uncompressed BI_RGB")
    val off = buf.getInt(10)
    require(w > 0, "non-positive width")
    val rowSize = (w * 3 + 3) / 4 * 4
    // header-declared geometry must fit the actual payload — a truncated
    // blob should fail validation, not AIOOBE mid-decode
    require(off >= 54 && off.toLong + rowSize.toLong * h <= bytes.length,
      "truncated BMP payload")
    val sums = new Array[Long](3) // B, G, R — file byte order
    var y = 0
    while (y < h) {
      val row = off + (h - 1 - y) * rowSize // file rows are bottom-up
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          sums(c) += bytes(row + x * 3 + c) & 0xff
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    BmpInfo(w, h, sums(2).toDouble / n, sums(1).toDouble / n,
      sums(0).toDouble / n)
  }

  /** Horizontal band means over a decoded BMP (mm03's image frames):
    * `n` top-down row bands, all-channel mean per band in [0, 255]. */
  def bmpBandMeans(bytes: Array[Byte], n: Int): Seq[Double] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    // more bands than rows would fabricate 0.0 ("black") frames for the
    // empty tail bands — indistinguishable from real black content
    require(n >= 1 && n <= h, s"band count $n outside 1..$h rows")
    val off = buf.getInt(10)
    require(w > 0, "non-positive width")
    val rowSize = (w * 3 + 3) / 4 * 4
    require(off >= 54 && off.toLong + rowSize.toLong * h <= bytes.length,
      "truncated BMP payload")
    val per = math.max(h / n, 1)
    (0 until n).map { k =>
      val from = k * per
      val until = if (k == n - 1) h else math.min((k + 1) * per, h)
      var sum = 0L
      var y = from
      while (y < until) {
        val row = off + (h - 1 - y) * rowSize
        var x = 0
        while (x < w * 3) { sum += bytes(row + x) & 0xff; x += 1 }
        y += 1
      }
      sum.toDouble / math.max((until - from).toLong * w * 3, 1L)
    }
  }

  // ---- G.711 μ-law audio ---------------------------------------------
  // The other standard library-free codec: logarithmic 8-bit companding
  // of 16-bit PCM (ITU-T G.711), carried in a WAV container with format
  // code 7 and 8 bits per sample.

  private val MuBias = 0x84 // 132
  private val MuClip = 32635

  /** G.711 μ-law encode of a 16-bit linear sample (truncating variant —
    * the classic segment/mantissa construction, bit-inverted on wire). */
  def mulawEncode(pcm: Int): Byte = {
    var s = pcm
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > MuClip) s = MuClip
    s += MuBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  /** G.711 μ-law decode back to 16-bit linear. */
  def mulawDecode(mu: Byte): Short = {
    val u = (~mu) & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val s = (((mantissa << 3) + MuBias) << exponent) - MuBias
    (if ((u & 0x80) != 0) -s else s).toShort
  }

  /** Valid μ-law WAV: RIFF/fmt(format=7, 8-bit)/data chunks over the
    * same seed-derived LCG signal [[syntheticWav]] carries, companded
    * sample by sample — so the encode∘decode roundtrip is integer
    * arithmetic a DuckDB oracle replays exactly (mm02/mm03). */
  def syntheticMulawWav(seed: Long, nSamples: Int = 800,
      sampleRate: Int = 8000): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7) // μ-law
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate: 1 byte/sample
      .putShort(1)        // block align
      .putShort(8)        // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(nSamples)
    var state = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < nSamples) {
      state = state * 6364136223846793005L + 1442695040888963407L
      buf.put(mulawEncode((state >>> 48).toShort.toInt))
      i += 1
    }
    buf.array()
  }

  /** Real μ-law WAV decode: container validation (format code 7, 8-bit),
    * per-byte expansion to linear PCM, peak + RMS over the LINEAR
    * signal — the decode step is load-bearing, not pass-through. */
  def decodeMulawWav(bytes: Array[Byte]): WavInfo = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE", "not a WAV")
    require(ascii(12, 4) == "fmt " && buf.getShort(20) == 7, "not mu-law")
    require(buf.getShort(34) == 8, "mu-law must be 8-bit")
    require(ascii(36, 4) == "data", "missing data chunk")
    val sampleRate = buf.getInt(24)
    val n = buf.getInt(40)
    require(n >= 0 && 44L + n <= bytes.length, "truncated mu-law payload")
    var peak = 0
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val s = mulawDecode(bytes(44 + i)).toInt
      if (math.abs(s) > peak) peak = math.abs(s)
      sumSq += s.toDouble * s
      i += 1
    }
    WavInfo(sampleRate, n, peak, math.sqrt(sumSq / math.max(n, 1)))
  }

  /** Per-window RMS over the μ-law-decoded linear signal (mm03's audio
    * frames). */
  def mulawWindowRms(bytes: Array[Byte], n: Int): Seq[Double] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val total = buf.getInt(40)
    // more windows than samples would fabricate 0.0 ("silent") frames
    require(n >= 1 && n <= total, s"window count $n outside 1..$total samples")
    require(44L + total <= bytes.length, "truncated mu-law payload")
    val per = math.max(total / n, 1)
    (0 until n).map { k =>
      val from = k * per
      val until = if (k == n - 1) total else math.min((k + 1) * per, total)
      var sumSq = 0.0
      var i = from
      while (i < until) {
        val s = mulawDecode(bytes(44 + i)).toDouble
        sumSq += s * s
        i += 1
      }
      math.sqrt(sumSq / math.max(until - from, 1))
    }
  }

  // ---- shared DuckDB oracle fragments -------------------------------
  // Recompute the LCG synthesis cross-engine: 64-bit wrap-around state
  // in HUGEINT (`(state·A + C) mod 2^64`, products < 2^127), exactly the
  // scheme mm05 proved for pixels — extended here to PCM samples (bits
  // 48..63, signed) and the μ-law encode∘decode roundtrip (pure integer
  // segment/mantissa quantisation, expressible with >>/&/CASE).

  private val LcgA = "6364136223846793005"
  private val LcgC = "1442695040888963407"
  private val LcgM = "18446744073709551616" // 2^64

  /** `pcm(doc_id, i, s)`: the signed 16-bit LCG samples of
    * [[syntheticWav]]/[[syntheticMulawWav]] for audio docs
    * (odd doc_id), via recursive CTE. */
  private def pcmCte(nSamples: Int): String =
    s"""alcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 2 = 1
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM alcg WHERE i < ${nSamples - 1}),
       |pcm AS (
       |  SELECT doc_id, i,
       |    CAST(CASE WHEN b >= 32768 THEN b - 65536 ELSE b END AS BIGINT) AS s
       |  FROM (SELECT doc_id, i, state // 281474976710656 AS b FROM alcg))"""
      .stripMargin

  /** `mulaw(doc_id, i, d)`: the G.711 encode∘decode roundtrip of `pcm.s`
    * — segment exponent by range CASE, mantissa by shift/mask, exactly
    * [[mulawEncode]]/[[mulawDecode]]'s integer math. */
  private val mulawCte: String =
    """mulaw AS (
      |  SELECT doc_id, i,
      |    CAST(CASE WHEN s < 0 THEN -dec0 ELSE dec0 END AS BIGINT) AS d
      |  FROM (
      |    SELECT doc_id, i, s,
      |      (((((a >> (e + 3)) & 15) * 8) + 132) * (1 << e)) - 132 AS dec0
      |    FROM (
      |      SELECT doc_id, i, s, a,
      |        CASE WHEN a >= 16384 THEN 7 WHEN a >= 8192 THEN 6
      |             WHEN a >= 4096 THEN 5 WHEN a >= 2048 THEN 4
      |             WHEN a >= 1024 THEN 3 WHEN a >= 512 THEN 2
      |             WHEN a >= 256 THEN 1 ELSE 0 END AS e
      |      FROM (SELECT doc_id, i, s,
      |              least(abs(s), 32635) + 132 AS a FROM pcm))))""".stripMargin

  /** `bmpb(doc_id, i, b)`: the 576 LCG pixel bytes of [[syntheticBmp]]
    * (16×12, rows already 4-byte aligned) for image docs (even doc_id);
    * generation index i has channel i%3 (BGR) and buffer row i/48. */
  private val bmpCte: String =
    s"""ilcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM ilcg WHERE i < 575),
       |bmpb AS (
       |  SELECT doc_id, i, CAST(state // 72057594037927936 AS BIGINT) AS b
       |  FROM ilcg)""".stripMargin

  /** Schema/plumbing query — the oracle checks modality split and byte
    * lengths of the identically-constructed BLOBs. */
  val mm01 = Q("mm01_media_schema",
    """SELECT media_type, count(*) AS n,
      |  CAST(sum(octet_length(content)) AS BIGINT) AS total_bytes
      |FROM (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
      |    CAST(md5(text) AS BLOB) AS content
      |  FROM documents)
      |GROUP BY media_type ORDER BY media_type""".stripMargin) { (s, d) =>
    mediaFrame(Tables.documents(s, d))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("content"))).cast("long").as("total_bytes"))
      .orderBy("media_type")
  }

  /** Decode + feature-extract through the mapPartitions path — REAL
    * decodes on both modalities (BMP pixels / μ-law samples). FULLY
    * ORACLED: DuckDB recomputes the BMP channel means from the pixel
    * LCG and the audio peak/RMS through the μ-law roundtrip CTE —
    * synthesis, companding, and feature arithmetic all cross-engine
    * bit-exact. */
  val mm02 = Q("mm02_decode_features",
    s"""WITH RECURSIVE $bmpCte,
       |${pcmCte(800)},
       |$mulawCte,
       |img AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN i % 3 = 2 THEN b END) AS DOUBLE) / 192 AS mr,
       |    CAST(sum(CASE WHEN i % 3 = 0 THEN b END) AS DOUBLE) / 192 AS mb
       |  FROM bmpb GROUP BY doc_id),
       |aud AS (
       |  SELECT doc_id, CAST(max(abs(d)) AS DOUBLE) AS peak,
       |    sqrt(CAST(sum(d * d) AS DOUBLE) / 800) AS rms
       |  FROM mulaw GROUP BY doc_id)
       |SELECT doc_id, 'image' AS media_type, CAST(630 AS BIGINT) AS n_bytes,
       |  CAST(16 AS DOUBLE) AS f0, CAST(12 AS DOUBLE) AS f1,
       |  mr AS f2, mb AS f3
       |FROM img
       |UNION ALL
       |SELECT doc_id, 'audio', CAST(844 AS BIGINT),
       |  CAST(8000 AS DOUBLE), CAST(800 AS DOUBLE), peak, rms
       |FROM aud
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    extractFeatures(realMediaFrame(Tables.documents(s, d)))
      .toDF().orderBy("doc_id")
  }

  /** Frame sampling over the media table: 1→N flatMap with real
    * per-band / per-window signal math. FULLY ORACLED: image bands are
    * contiguous pixel-LCG blocks (display band k = generation rows
    * 3-k·3.. — the bottom-up row flip folded into the band index);
    * audio windows are μ-law-roundtrip RMS over sample blocks. */
  val mm03 = Q("mm03_frame_sample",
    s"""WITH RECURSIVE $bmpCte,
       |${pcmCte(800)},
       |$mulawCte
       |SELECT doc_id, frame_no, n_bytes, f0 FROM (
       |  SELECT doc_id, CAST(band AS INTEGER) AS frame_no,
       |    CAST(630 AS BIGINT) AS n_bytes,
       |    (CAST(sum(b) AS DOUBLE) / 144) / 255.0 AS f0
       |  FROM (SELECT doc_id, 3 - (i // 144) AS band, b FROM bmpb)
       |  GROUP BY doc_id, band
       |  UNION ALL
       |  SELECT doc_id, CAST(w AS INTEGER), CAST(844 AS BIGINT),
       |    sqrt(CAST(sum(d * d) AS DOUBLE) / 200) / 32768.0 AS f0
       |  FROM (SELECT doc_id, i // 200 AS w, d FROM mulaw)
       |  GROUP BY doc_id, w)
       |ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
    sampleFrames(realMediaFrame(Tables.documents(s, d)), 4)
      .toDF().orderBy("doc_id", "frame_no")
  }

  /** REAL audio decode path: a valid WAV per audio doc (deterministic
    * LCG signal), decoded — header validation + peak/RMS — through
    * mapPartitions. FULLY ORACLED: DuckDB replays the sample LCG; the
    * RMS is sqrt of an exact-integer double (Σs² < 2^53), so the double
    * math is bit-identical cross-engine. */
  val mm04 = Q("mm04_wav_decode",
    s"""WITH RECURSIVE ${pcmCte(800)}
       |SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
       |  CAST(800 AS INTEGER) AS n_samples,
       |  CAST(max(abs(s)) AS INTEGER) AS peak,
       |  sqrt(CAST(sum(s * s) AS DOUBLE) / 800) AS rms
       |FROM pcm GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        // per-partition init point (a real codec would allocate here)
        ids.map { id =>
          val info = decodeWav(syntheticWav(id))
          (id, info.sample_rate, info.n_samples, info.peak, info.rms)
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "peak", "rms")
      .orderBy("doc_id")
  }

  /** REAL image pipeline: PPM synth → nearest-neighbour resize (actual
    * pixel indexing) → decode of the RESIZED bytes → channel means.
    *
    * FULLY ORACLED: the synthesis LCG is pure integer arithmetic, so
    * DuckDB recomputes the identical pixels with wrap-around 64-bit
    * state in HUGEINT (`(state·A + C) mod 2⁶⁴`; products stay under
    * 2¹²⁷) via a recursive CTE, applies the same nearest-neighbour
    * index map `in((2y·16+2x)·3+c)`, and divides the integer channel
    * sums once — pixel generation, resize indexing, and mean
    * arithmetic are all cross-engine checked bit-exactly. */
  val mm05 = Q("mm05_ppm_resize", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $A + $C) % $M * $A + $C) % $M
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $A + $C) % $M FROM lcg WHERE i < 575),
       |grid AS (
       |  SELECT x, y, c FROM (SELECT unnest(range(8)) AS x),
       |       (SELECT unnest(range(6)) AS y), (SELECT unnest(range(3)) AS c)),
       |sel AS (
       |  SELECT l.doc_id, g.c,
       |         CAST(l.state // 72057594037927936 AS BIGINT) AS b
       |  FROM grid g JOIN lcg l ON l.i = (2*g.y*16 + 2*g.x)*3 + g.c),
       |means AS (
       |  SELECT doc_id, c, CAST(sum(b) AS DOUBLE) / 48 AS m
       |  FROM sel GROUP BY doc_id, c)
       |SELECT r.doc_id, CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
       |       r.m AS mean_r, g.m AS mean_g, b.m AS mean_b
       |FROM (SELECT doc_id, m FROM means WHERE c = 0) r
       |JOIN (SELECT doc_id, m FROM means WHERE c = 1) g ON g.doc_id = r.doc_id
       |JOIN (SELECT doc_id, m FROM means WHERE c = 2) b ON b.doc_id = r.doc_id
       |ORDER BY r.doc_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val info = decodePpm(resizePpm(syntheticPpm(id), 8, 6))
        (id, info.width, info.height, info.mean_r, info.mean_g, info.mean_b)
      })
      .toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
      .orderBy("doc_id")
  }

  /** REAL frame sampling: PCM payload split into 4 windows, per-window
    * peak + RMS — the 1→N flatMap with actual signal math. FULLY
    * ORACLED via the same sample-LCG CTE as mm04, grouped by window. */
  val mm06 = Q("mm06_wav_frames",
    s"""WITH RECURSIVE ${pcmCte(800)}
       |SELECT doc_id, CAST(w AS INTEGER) AS frame_no,
       |  CAST(count(*) AS INTEGER) AS n_samples,
       |  CAST(max(abs(s)) AS INTEGER) AS peak,
       |  sqrt(CAST(sum(s * s) AS DOUBLE) / 200) AS rms
       |FROM (SELECT doc_id, i // 200 AS w, s FROM pcm)
       |GROUP BY doc_id, w ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
      .select("doc_id").as[Long]
      .flatMap(id => wavFrames(id, syntheticWav(id), 4))
      .toDF()
      .orderBy("doc_id", "frame_no")
  }

  /** REAL augmentation pipeline: PPM synth → horizontal flip → center
    * crop (8×6 out of 16×12) → decode of the augmented bytes — the
    * train-time image augmentations as dataflow, every byte re-encoded
    * as a valid PPM between stages so each step consumes a real codec
    * payload. FULLY ORACLED the mm05 way: flip∘crop composes to the
    * index map `in(((3+y)·16 + (11−x))·3 + c)`, which DuckDB applies to
    * the identical HUGEINT pixel LCG — synthesis, flip/crop indexing,
    * and mean arithmetic all cross-engine bit-exact. (CodecSpec pins
    * the codec laws the oracle can't state: flip is an involution,
    * crop geometry, header validation.) */
  val mm07 = Q("mm07_ppm_augment", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $A + $C) % $M * $A + $C) % $M
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $A + $C) % $M FROM lcg WHERE i < 575),
       |grid AS (
       |  SELECT x, y, c FROM (SELECT unnest(range(8)) AS x),
       |       (SELECT unnest(range(6)) AS y), (SELECT unnest(range(3)) AS c)),
       |sel AS (
       |  SELECT l.doc_id, g.c,
       |         CAST(l.state // 72057594037927936 AS BIGINT) AS b
       |  FROM grid g JOIN lcg l ON l.i = ((3 + g.y)*16 + (11 - g.x))*3 + g.c),
       |means AS (
       |  SELECT doc_id, c, CAST(sum(b) AS DOUBLE) / 48 AS m
       |  FROM sel GROUP BY doc_id, c)
       |SELECT r.doc_id, CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
       |       r.m AS mean_r, g.m AS mean_g, b.m AS mean_b
       |FROM (SELECT doc_id, m FROM means WHERE c = 0) r
       |JOIN (SELECT doc_id, m FROM means WHERE c = 1) g ON g.doc_id = r.doc_id
       |JOIN (SELECT doc_id, m FROM means WHERE c = 2) b ON b.doc_id = r.doc_id
       |ORDER BY r.doc_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val info = decodePpm(cropPpm(flipPpm(syntheticPpm(id)), 4, 3, 8, 6))
        (id, info.width, info.height, info.mean_r, info.mean_g, info.mean_b)
      })
      .toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm08
  /** REAL audio augmentation pipeline: WAV synth → 1.5× gain (integer
    * rational, clipped to PCM16) → 2× decimation (4000 Hz) → decode of
    * the augmented bytes — train-time audio augmentations as dataflow,
    * each stage re-encoding a valid WAV (the mm07 discipline, audio
    * side). FULLY ORACLED: DuckDB replays the sample LCG, applies the
    * same sign-split magnitude scaling (floor division on non-negative
    * dividends == Java truncation) and the i%2 decimation filter;
    * Σd² < 2^53 keeps the RMS double bit-exact cross-engine. */
  val mm08 = Q("mm08_wav_augment",
    s"""WITH RECURSIVE ${pcmCte(800)},
       |aug AS (
       |  SELECT doc_id, i,
       |    CASE WHEN s < 0 THEN -least((-s) * 3 // 2, 32768)
       |         ELSE least(s * 3 // 2, 32767) END AS d
       |  FROM pcm WHERE i % 2 = 0)
       |SELECT doc_id, CAST(4000 AS INTEGER) AS sample_rate,
       |  CAST(400 AS INTEGER) AS n_samples,
       |  CAST(max(abs(d)) AS INTEGER) AS peak,
       |  sqrt(CAST(sum(d * d) AS DOUBLE) / 400) AS rms
       |FROM aug GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val info = decodeWav(decimateWav(gainWav(syntheticWav(id), 3, 2), 2))
        (id, info.sample_rate, info.n_samples, info.peak, info.rms)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "peak", "rms")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm09
  /** COMPRESSED-codec round-trip, fully oracled: the LCG pixel plane is
    * encoded as a real PNG ([[Png.encode]]: zlib via the JDK's Deflater,
    * per-row filter cycling through all five types, two IDAT chunks),
    * decoded back ([[Png.decode]]: CRC-checked chunks, Inflater,
    * filter reconstruction), and reduced to exact integer stats — per-
    * channel sums plus a position-weighted checksum `Σ (i+1)·byte` that
    * pins byte ORDER, not just totals. The DuckDB oracle recomputes the
    * stats straight from the HUGEINT pixel LCG (the mm05 scheme) and
    * never sees a PNG byte: the oracle hash can only match if
    * decode(encode(pixels)) reproduced every byte in position, so the
    * whole compression layer is cross-engine checked without DuckDB
    * needing zlib. Closes the r05 "compressed-media codecs" scope note
    * within the container's means — PNG's compression layer ships in
    * the JDK. (CodecSpec pins the codec laws the oracle can't state:
    * bit-exact round-trip at edge geometries, CRC tamper detection,
    * unsupported-shape rejection.) */
  val mm09 = Q("mm09_png_roundtrip", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $A + $C) % $M * $A + $C) % $M
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $A + $C) % $M FROM lcg WHERE i < 575),
       |bytes AS (
       |  SELECT doc_id, i,
       |    CAST(state // 72057594037927936 AS BIGINT) AS b
       |  FROM lcg)
       |SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
       |  CAST(sum(b) FILTER (WHERE i % 3 = 0) AS BIGINT) AS sum_r,
       |  CAST(sum(b) FILTER (WHERE i % 3 = 1) AS BIGINT) AS sum_g,
       |  CAST(sum(b) FILTER (WHERE i % 3 = 2) AS BIGINT) AS sum_b,
       |  CAST(sum((i + 1) * b) AS BIGINT) AS checksum
       |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val src = syntheticPpm(id) // 16×12 LCG pixel plane behind a PPM header
        val off = ppmHeader(src)._3
        val pixels = java.util.Arrays.copyOfRange(src, off, src.length)
        val img = Png.decode(Png.encode(pixels, 16, 12))
        require(img.width == 16 && img.height == 12, "round-trip geometry lost")
        var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
        var i = 0
        while (i < img.pixels.length) {
          val b = img.pixels(i) & 0xff
          (i % 3) match {
            case 0 => sr += b
            case 1 => sg += b
            case _ => sb += b
          }
          ck += (i + 1).toLong * b
          i += 1
        }
        (id, 16, 12, sr, sg, sb, ck)
      })
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b", "checksum")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm10
  /** Compressed-format TRANSFORM pipeline: PNG → decode → 2× nearest-
    * neighbour downsample → re-encode PNG → decode → stats. mm07 proved
    * the augment-between-valid-containers discipline on uncompressed
    * PPM; this runs the same discipline through the compressed codec
    * TWICE (every stage boundary is a real zlib-compressed container),
    * which is what a thumbnailing/resolution-normalisation pass over an
    * image corpus actually does. Oracle: the resize composes to the
    * index map `in((2y·16 + 2x)·3 + c)` (mm05's), which DuckDB applies
    * to the HUGEINT pixel LCG — means AND a position-weighted checksum
    * over the RESIZED byte order, so both round-trips and the indexing
    * are cross-engine pinned without DuckDB touching zlib. */
  val mm10 = Q("mm10_png_resize", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $A + $C) % $M * $A + $C) % $M
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $A + $C) % $M FROM lcg WHERE i < 575),
       |grid AS (
       |  SELECT x, y, c FROM (SELECT unnest(range(8)) AS x),
       |       (SELECT unnest(range(6)) AS y), (SELECT unnest(range(3)) AS c)),
       |sel AS (
       |  SELECT l.doc_id, g.x, g.y, g.c,
       |         (g.y * 8 + g.x) * 3 + g.c AS j,
       |         CAST(l.state // 72057594037927936 AS BIGINT) AS b
       |  FROM grid g JOIN lcg l ON l.i = (2*g.y*16 + 2*g.x)*3 + g.c)
       |SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
       |  CAST(sum(b) FILTER (WHERE c = 0) AS DOUBLE) / 48 AS mean_r,
       |  CAST(sum(b) FILTER (WHERE c = 1) AS DOUBLE) / 48 AS mean_g,
       |  CAST(sum(b) FILTER (WHERE c = 2) AS DOUBLE) / 48 AS mean_b,
       |  CAST(sum((j + 1) * b) AS BIGINT) AS checksum
       |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val src = syntheticPpm(id)
        val off = ppmHeader(src)._3
        val pixels = java.util.Arrays.copyOfRange(src, off, src.length)
        val full = Png.decode(Png.encode(pixels, 16, 12)) // round-trip 1
        val small = new Array[Byte](8 * 6 * 3)
        var y = 0
        while (y < 6) {
          var x = 0
          while (x < 8) {
            var c = 0
            while (c < 3) {
              small((y * 8 + x) * 3 + c) =
                full.pixels(((2 * y) * 16 + 2 * x) * 3 + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val out = Png.decode(Png.encode(small, 8, 6)) // round-trip 2
        var sums = new Array[Long](3); var ck = 0L
        var j = 0
        while (j < out.pixels.length) {
          val b = out.pixels(j) & 0xff
          sums(j % 3) += b
          ck += (j + 1).toLong * b
          j += 1
        }
        (id, out.width, out.height, sums(0).toDouble / 48,
          sums(1).toDouble / 48, sums(2).toDouble / 48, ck)
      })
      .toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "checksum")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm11
  /** Second REAL compressed codec, second compression FAMILY: GIF87a
    * round-trip through [[Gif]]'s library-free LZW (variable-width
    * 9→12-bit codes, LSB-first packing, sub-block framing) — where
    * mm09's PNG is LZ77+Huffman via the JDK's zlib, this is dictionary
    * coding implemented from the spec. A crawl corpus carries both
    * families; decode coverage is per-format. Same discipline as mm09:
    * the synthetic index plane is the shared 64-bit LCG, the round-trip
    * must be byte-lossless (indexed color with an identity grayscale
    * palette), and the oracle replays the LCG in HUGEINT and checks an
    * order-weighted checksum over the decoded index stream — so a
    * single transposed or corrupted pixel anywhere mismatches. Pure
    * map-side mapPartitions; CPU scales with pixels, not docs. */
  val mm11 = Q("mm11_gif_roundtrip", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $A + $C) % $M * $A + $C) % $M
       |  FROM documents WHERE doc_id % 2 = 1
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $A + $C) % $M FROM lcg WHERE i < 191),
       |bytes AS (
       |  SELECT doc_id, i,
       |    CAST(state // 72057594037927936 AS BIGINT) AS b
       |  FROM lcg)
       |SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
       |  CAST(sum(b) AS BIGINT) AS sum_idx,
       |  CAST(min(b) AS BIGINT) AS min_idx,
       |  CAST(max(b) AS BIGINT) AS max_idx,
       |  CAST(sum((i + 1) * b) AS BIGINT) AS checksum
       |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 1)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val src = syntheticPpm(id)
        val off = ppmHeader(src)._3
        // first 192 LCG bytes as a 16×12 index plane
        val idx = java.util.Arrays.copyOfRange(src, off, off + 192)
        val img = Gif.decode(Gif.encode(idx, 16, 12))
        require(img.width == 16 && img.height == 12, "round-trip geometry lost")
        require(java.util.Arrays.equals(img.indices, idx),
          "LZW round-trip not byte-lossless")
        var sum = 0L; var mn = 255L; var mx = 0L; var ck = 0L
        var i = 0
        while (i < img.indices.length) {
          val b = img.indices(i) & 0xff
          sum += b; ck += (i + 1).toLong * b
          if (b < mn) mn = b
          if (b > mx) mx = b
          i += 1
        }
        (id, 16, 12, sum, mn, mx, ck)
      })
      .toDF("doc_id", "width", "height", "sum_idx", "min_idx", "max_idx",
        "checksum")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm12
  /** Perceptual near-dup detection over IMAGES — the multimodal arm of
    * the dedup tier: [[aHashPpm]] fingerprints (64-bit average-hash),
    * then the d09 pigeonhole discipline on 8 bands of 8 bits — any pair
    * within Hamming 7 shares at least one intact band, so the banded
    * equi join has GUARANTEED recall at the threshold while comparing
    * only band-colliding candidates (join fanout ≈ |A|·|B|·8/256 for
    * unrelated hashes, never all-pairs). The registry is every 8th
    * document's image re-encoded through the real brightness+4
    * augmentation ([[brightnessPpm]] — saturating channel lift), whose
    * measured drift is ≤ 2 bits vs the ~32-bit binomial center of
    * unrelated pairs; the verify pass computes exact
    * `bit_count(xor)` only on candidates. FULLY ORACLED the mm05 way:
    * DuckDB rebuilds pixels from the HUGEINT LCG, derives gray cells /
    * clamped augmented gray, assembles both hashes with integer-exact
    * `gray·64 > total` bits (HUGEINT bit weights, wrapped to BIGINT),
    * and replays banding, candidate dedup, and the Hamming verify. */
  val mm12 = Q("mm12_phash_neardup", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $A + $C) % $M * $A + $C) % $M
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $A + $C) % $M FROM lcg WHERE i < 575),
       |cells AS (
       |  SELECT x, y FROM (SELECT unnest(range(8)) AS x),
       |       (SELECT unnest(range(8)) AS y)),
       |gray AS (
       |  SELECT l.doc_id, g.y * 8 + g.x AS cell,
       |    sum(CAST(l.state // 72057594037927936 AS BIGINT)) AS ga,
       |    sum(least(CAST(l.state // 72057594037927936 AS BIGINT) + 4, 255)) AS gb
       |  FROM cells g
       |  CROSS JOIN (SELECT unnest(range(3)) AS c) ch
       |  JOIN lcg l ON l.i = ((g.y * 12 // 8) * 16 + g.x * 2) * 3 + ch.c
       |  GROUP BY l.doc_id, g.y * 8 + g.x),
       |totals AS (
       |  SELECT doc_id, sum(ga) AS ta, sum(gb) AS tb FROM gray GROUP BY doc_id),
       |hashes AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN sa >= 9223372036854775808 THEN sa - $M ELSE sa END
       |      AS BIGINT) AS ahash,
       |    CAST(CASE WHEN sb >= 9223372036854775808 THEN sb - $M ELSE sb END
       |      AS BIGINT) AS bhash
       |  FROM (
       |    SELECT g.doc_id,
       |      sum(CASE WHEN g.ga * 64 > t.ta
       |          THEN CAST(1 AS HUGEINT) << g.cell ELSE CAST(0 AS HUGEINT) END) AS sa,
       |      sum(CASE WHEN g.gb * 64 > t.tb
       |          THEN CAST(1 AS HUGEINT) << g.cell ELSE CAST(0 AS HUGEINT) END) AS sb
       |    FROM gray g JOIN totals t USING (doc_id)
       |    GROUP BY g.doc_id)),
       |bands AS (SELECT unnest(range(8)) AS j),
       |ab AS (
       |  SELECT doc_id AS a_id, ahash, j, (ahash >> (j * 8)) & 255 AS band
       |  FROM hashes CROSS JOIN bands),
       |bb AS (
       |  SELECT doc_id + 5000000 AS b_id, bhash, j,
       |         (bhash >> (j * 8)) & 255 AS band
       |  FROM hashes CROSS JOIN bands WHERE doc_id % 8 = 0),
       |cand AS (
       |  SELECT DISTINCT a_id, b_id, ahash, bhash FROM ab JOIN bb USING (j, band))
       |SELECT a_id, b_id, CAST(bit_count(xor(ahash, bhash)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(ahash, bhash)) <= 7
       |ORDER BY a_id, b_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).select("doc_id").as[Long]
    val aH = ids.mapPartitions(_.map(id => (id, aHashPpm(syntheticPpm(id)))))
      .toDF("a_id", "ahash")
    val bH = ids.filter(_ % 8 == 0).mapPartitions(_.map(id =>
        (id + 5000000L, aHashPpm(brightnessPpm(syntheticPpm(id), 4)))))
      .toDF("b_id", "bhash")
    val aB = aH.select(col("a_id"), col("ahash"),
        explode(sequence(lit(0), lit(7))).as("j"))
      .withColumn("band", expr("shiftright(ahash, j * 8) & 255"))
    val bB = bH.select(col("b_id"), col("bhash"),
        explode(sequence(lit(0), lit(7))).as("j"))
      .withColumn("band", expr("shiftright(bhash, j * 8) & 255"))
    aB.join(bB, Seq("j", "band"))
      .select("a_id", "b_id", "ahash", "bhash").distinct()
      .selectExpr("a_id", "b_id",
        "CAST(bit_count(ahash ^ bhash) AS BIGINT) AS hamming")
      .filter(col("hamming") <= 7)
      .orderBy("a_id", "b_id")
  }

  /** Synthetic multi-frame "video": `frames` concatenated P6 frames
    * (16×12), a real container a decoder must WALK (each frame has its
    * own header; offsets are data-dependent). Scene structure: frames
    * 2k/2k+1 share scene k — a held shot (both frames carry the
    * identical scene-seeded LCG pixels), so consecutive same-scene
    * frames have histogram distance exactly 0 while scene boundaries
    * differ by independent white noise. */
  def syntheticVideo(docId: Long, frames: Int = 6,
      w: Int = 16, h: Int = 12): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val frameLen = header.length + w * h * 3
    val out = new Array[Byte](frameLen * frames)
    var f = 0
    while (f < frames) {
      System.arraycopy(header, 0, out, f * frameLen, header.length)
      var state = (docId * 7 + f / 2) * 6364136223846793005L +
        1442695040888963407L
      var i = 0
      while (i < w * h * 3) {
        state = state * 6364136223846793005L + 1442695040888963407L
        out(f * frameLen + header.length + i) = (state >>> 56).toByte
        i += 1
      }
      f += 1
    }
    out
  }

  case class VideoFrameStat(doc_id: Long, frame_no: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, hist: Array[Long])

  /** Real container walk: parse each frame's own P6 header at its
    * data-dependent offset, then exact per-channel integer sums and the
    * 64-bin luminance-byte histogram (the bounded per-frame signature
    * scene-cut detection runs on — 64 counts no matter the frame's
    * resolution). */
  def decodeVideoFrames(docId: Long, bytes: Array[Byte]): Seq[VideoFrameStat] = {
    val out = Seq.newBuilder[VideoFrameStat]
    var off = 0
    var f = 0
    while (off < bytes.length) {
      val head = java.util.Arrays.copyOfRange(bytes, off,
        math.min(off + 64, bytes.length))
      val (w, h, dataOff) = ppmHeader(head)
      val sums = new Array[Long](3)
      val hist = new Array[Long](64)
      var i = 0
      while (i < w * h * 3) {
        val b = bytes(off + dataOff + i) & 0xff
        sums(i % 3) += b
        hist(b / 4) += 1
        i += 1
      }
      out += VideoFrameStat(docId, f, sums(0), sums(1), sums(2), hist)
      off += dataOff + w * h * 3
      f += 1
    }
    out.result()
  }

  // --------------------------------------------------------------- mm13
  /** Video scene-cut detection — the temporal tier the image (spatial)
    * and audio (sample-window) tiers don't exercise: decode a
    * multi-frame container sequentially (REAL header walking — each
    * offset depends on the previous frame's parsed dimensions), reduce
    * every frame to a 64-bin byte histogram (histogram differencing,
    * the textbook cut detector — and the scale story: the per-frame
    * signature is 64 counts whatever the resolution, so the doc-keyed
    * lag window carries bounded state, never pixels), and segment
    * scenes by thresholding the inter-frame histogram L1. Everything is
    * integer arithmetic end to end, so synthesis, container walk,
    * histogramming, temporal differencing, and segmentation all oracle
    * bit-exactly: DuckDB replays the scene-seeded HUGEINT LCG, bins
    * `b // 4`, grids the missing bins, and applies the same lag. Held
    * same-scene frames give L1 = 0 by construction; scene boundaries
    * are independent-noise-sized (~220, empirically ≥ natural
    * fluctuation floors); threshold 64 sits between. At 100 TB the
    * decode is a map-only mapPartitions pass (the codec-init shape). */
  val mm13 = Q("mm13_video_scene_cuts", {
    val A = "6364136223846793005"
    val C = "1442695040888963407"
    val M = "18446744073709551616" // 2^64
    s"""WITH RECURSIVE vlcg(doc_id, fr, i, state) AS (
       |  SELECT doc_id, fr, 0,
       |    ((CAST(doc_id * 7 + fr // 2 AS HUGEINT) * $A + $C) % $M
       |     * $A + $C) % $M
       |  FROM documents, (SELECT unnest(range(6)) AS fr)
       |  WHERE doc_id % 4 = 0
       |  UNION ALL
       |  SELECT doc_id, fr, i + 1, (state * $A + $C) % $M
       |  FROM vlcg WHERE i < 575),
       |vb AS (
       |  SELECT doc_id, fr, i,
       |    CAST(state // 72057594037927936 AS BIGINT) AS b
       |  FROM vlcg),
       |fs AS (
       |  SELECT doc_id, fr,
       |    sum(CASE WHEN i % 3 = 0 THEN b END) AS sum_r,
       |    sum(CASE WHEN i % 3 = 1 THEN b END) AS sum_g,
       |    sum(CASE WHEN i % 3 = 2 THEN b END) AS sum_b
       |  FROM vb GROUP BY doc_id, fr),
       |hb AS (
       |  SELECT doc_id, fr, b // 4 AS bin, count(*) AS c
       |  FROM vb GROUP BY doc_id, fr, b // 4),
       |grid AS (
       |  SELECT DISTINCT hb.doc_id, hb.fr, bn.bin
       |  FROM hb, (SELECT unnest(range(64)) AS bin) bn),
       |h AS (
       |  SELECT g.doc_id, g.fr, g.bin, coalesce(hb.c, 0) AS c
       |  FROM grid g LEFT JOIN hb
       |    ON g.doc_id = hb.doc_id AND g.fr = hb.fr AND g.bin = hb.bin),
       |l1 AS (
       |  SELECT doc_id, fr,
       |    sum(abs(c - coalesce(prev_c, c))) AS hist_l1
       |  FROM (
       |    SELECT doc_id, fr, bin, c,
       |      lag(c) OVER (PARTITION BY doc_id, bin ORDER BY fr) AS prev_c
       |    FROM h)
       |  GROUP BY doc_id, fr)
       |SELECT fs.doc_id, CAST(fs.fr AS INTEGER) AS frame_no,
       |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       |  CAST(sum_b AS BIGINT) AS sum_b,
       |  CAST(hist_l1 AS BIGINT) AS hist_l1,
       |  hist_l1 > 64 AS is_cut
       |FROM fs JOIN l1 ON fs.doc_id = l1.doc_id AND fs.fr = l1.fr
       |ORDER BY fs.doc_id, frame_no""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val stats = Tables.documents(s, d).select("doc_id").as[Long]
      .filter(_ % 4 == 0)
      .mapPartitions(_.flatMap(id =>
        decodeVideoFrames(id, syntheticVideo(id))))
      .toDF()
    val w = Window.partitionBy("doc_id").orderBy("frame_no")
    stats
      .withColumn("prev", lag(col("hist"), 1).over(w))
      .withColumn("hist_l1", when(col("prev").isNull, lit(0L)).otherwise(
        expr("""aggregate(zip_with(hist, prev, (a, b) -> abs(a - b)),
               |0L, (acc, x) -> acc + x)""".stripMargin)))
      .withColumn("is_cut", col("hist_l1") > 64)
      .select("doc_id", "frame_no", "sum_r", "sum_g", "sum_b",
        "hist_l1", "is_cut")
      .orderBy("doc_id", "frame_no")
  }

  // --------------------------------------------------------------- mm14
  /** Candidate square-tone periods (samples per cycle) — the "dial pad"
    * the detector tests; true period per audio doc cycles through them
    * by id. Amplitude leaves ±2 kHz of LCG-noise headroom inside
    * PCM16. */
  val TonePeriods = Seq(8, 10, 16, 20)
  val ToneAmp = 8000
  val ToneSamples = 800

  /** Valid mono PCM16LE WAV carrying a square tone of the doc's true
    * period plus 12-bit LCG noise — the same RIFF writer discipline as
    * [[syntheticWav]], same two-step LCG state init, pure integer so
    * DuckDB replays every sample in HUGEINT. */
  def syntheticToneWav(docId: Long, nSamples: Int = ToneSamples): Array[Byte] = {
    val t = TonePeriods((((docId - 1) / 2) % 4).toInt)
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var state = docId * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < nSamples) {
      state = state * 6364136223846793005L + 1442695040888963407L
      val noise = (state >>> 52).toInt - 2048
      val square = if (i % t < t / 2) ToneAmp else -ToneAmp
      buf.putShort((square + noise).toShort)
      i += 1
    }
    buf.array()
  }

  /** Real matched-filter detection over decoded PCM: correlate the
    * signal against every candidate square template, score = |Σ s·±1|
    * (a pure BIGINT sum), detected = argmax (first index — smallest
    * period — on ties). */
  def detectTone(bytes: Array[Byte]): (Int, Seq[Long]) = {
    val (_, samples) = wavSamples(bytes)
    val scores = TonePeriods.map { t =>
      var acc = 0L
      var i = 0
      while (i < samples.length) {
        acc += samples(i) * (if (i % t < t / 2) 1L else -1L)
        i += 1
      }
      math.abs(acc)
    }
    (TonePeriods(scores.indexOf(scores.max)), scores)
  }

  /** Tone detection by matched filter — the audio CONTENT-analysis arm
    * (mm02–mm08 measure energy/shape; this identifies WHAT is playing):
    * each audio doc carries a square tone of one of [[TonePeriods]]
    * periods under 12-bit LCG noise, and the detector correlates the
    * decoded PCM against every candidate template — exactly how real
    * DTMF/pilot-tone detectors work (a per-frequency correlator is the
    * integer-exact stand-in for Goertzel/FFT, whose float recursions
    * have no cross-engine bit guarantee). Every score is an exact
    * BIGINT sum of ±sample terms, so scores AND the argmax are
    * bit-identical in both engines; cross-period correlations cancel
    * over full cycles (square waves at these periods are near-
    * orthogonal over 800 samples), giving the detector a ~25× score
    * margin the spec quantifies.
    *
    * Scale shape: map-only — synth/decode/correlate fuse into the scan
    * (mm04's mapPartitions tier); the per-doc signature is 4 integers
    * regardless of audio length, so the shuffle to the sorted output
    * carries 5 longs per doc. The oracle replays the LCG samples in a
    * recursive HUGEINT CTE, rebuilds both the square and the templates
    * from arithmetic, and recomputes every score and the argmax —
    * detection is hash-checked end to end, not spot-checked. */
  val mm14 = Q("mm14_tone_detect", {
    s"""WITH RECURSIVE tlcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 2 = 1
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM tlcg WHERE i < ${ToneSamples - 1}),
       |tper AS (
       |  SELECT doc_id,
       |    CASE ((doc_id - 1) // 2) % 4 WHEN 0 THEN 8 WHEN 1 THEN 10
       |         WHEN 2 THEN 16 ELSE 20 END AS t
       |  FROM documents WHERE doc_id % 2 = 1),
       |sig AS (
       |  SELECT l.doc_id, l.i,
       |    (CASE WHEN l.i % p.t < p.t // 2 THEN $ToneAmp ELSE -$ToneAmp END)
       |      + CAST(l.state // 4503599627370496 AS BIGINT) - 2048 AS s
       |  FROM tlcg l JOIN tper p ON p.doc_id = l.doc_id),
       |scores AS (
       |  SELECT doc_id,
       |    abs(sum(s * (CASE WHEN i % 8 < 4 THEN 1 ELSE -1 END))) AS s8,
       |    abs(sum(s * (CASE WHEN i % 10 < 5 THEN 1 ELSE -1 END))) AS s10,
       |    abs(sum(s * (CASE WHEN i % 16 < 8 THEN 1 ELSE -1 END))) AS s16,
       |    abs(sum(s * (CASE WHEN i % 20 < 10 THEN 1 ELSE -1 END))) AS s20
       |  FROM sig GROUP BY doc_id)
       |SELECT sc.doc_id, CAST(p.t AS BIGINT) AS true_period,
       |  CAST(CASE WHEN s8 >= s10 AND s8 >= s16 AND s8 >= s20 THEN 8
       |       WHEN s10 >= s16 AND s10 >= s20 THEN 10
       |       WHEN s16 >= s20 THEN 16 ELSE 20 END AS BIGINT)
       |    AS detected_period,
       |  CAST(s8 AS BIGINT) AS score_t8, CAST(s10 AS BIGINT) AS score_t10,
       |  CAST(s16 AS BIGINT) AS score_t16, CAST(s20 AS BIGINT) AS score_t20
       |FROM scores sc JOIN tper p USING (doc_id)
       |ORDER BY sc.doc_id""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (detected, sc) = detectTone(syntheticToneWav(id))
          val truePeriod = TonePeriods((((id - 1) / 2) % 4).toInt)
          (id, truePeriod.toLong, detected.toLong,
            sc(0), sc(1), sc(2), sc(3))
        }
      }
      .toDF("doc_id", "true_period", "detected_period",
        "score_t8", "score_t10", "score_t16", "score_t20")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm15
  /** Integer Sobel edge statistics of a P6 PPM: per interior pixel the
    * 3×3 Gx/Gy convolutions over `gray = r+g+b` (no luma division —
    * stays integer-exact), magnitude = |Gx|+|Gy| (the L1 norm — exact
    * where sqrt is not), returning (Σ magnitude, max magnitude and its
    * coordinates, ties to the min (y, x)). */
  def sobelPpm(bytes: Array[Byte]): (Long, Long, Int, Int) = {
    val (w, h, off) = ppmHeader(bytes)
    val gray = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      gray(p) = (bytes(off + p * 3) & 0xff) + (bytes(off + p * 3 + 1) & 0xff) +
        (bytes(off + p * 3 + 2) & 0xff)
      p += 1
    }
    def g(x: Int, y: Int) = gray(y * w + x)
    var energy = 0L; var maxMag = -1L; var mx = 0; var my = 0
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x - 1, y) - g(x - 1, y + 1)
        val gy = g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x, y - 1) - g(x + 1, y - 1)
        val mag = math.abs(gx).toLong + math.abs(gy).toLong
        energy += mag
        if (mag > maxMag) { maxMag = mag; mx = x; my = y }
        x += 1
      }
      y += 1
    }
    (energy, maxMag, mx, my)
  }

  /** Sobel edge detection over the image corpus — the CONVOLUTION class
    * of image analysis (mm02/mm05 aggregate globally, mm13 differences
    * whole frames; nothing yet reads a pixel NEIGHBORHOOD): per even-doc
    * 16×12 PPM, total L1 edge energy plus the strongest-gradient pixel.
    * The integer-exact stand-in for every conv-net preprocessing stage —
    * kernels, not decode, are what the feature extractor pays for.
    *
    * FULLY ORACLED the mm05 way: DuckDB replays the pixel LCG, folds the
    * 3 channel bytes per pixel into the same integer gray, applies the
    * identical ±1/±2 kernel via a 9-row (dx, dy) kernel table joined on
    * neighbour coordinates, and elects the same argmax under the
    * (mag DESC, y, x) total order — synthesis, convolution, and ranking
    * all cross-engine bit-exact. `CodecSpec` pins the kernel laws the
    * oracle can't state (flat image → zero energy; a vertical step edge
    * responds in Gx only, at 4× the step).
    *
    * Scale: one `mapPartitions` codec pass per image — embarrassingly
    * parallel, O(w·h) per image, 4 scalars out; the convolution never
    * leaves the task. */
  val mm15 = Q("mm15_sobel_edges",
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM lcg WHERE i < 575),
       |gray AS (
       |  SELECT doc_id, (i // 3) % 16 AS x, i // 48 AS y,
       |    sum(CAST(state // 72057594037927936 AS BIGINT)) AS g
       |  FROM lcg GROUP BY 1, 2, 3),
       |kern AS (
       |  SELECT dx.d AS dx, dy.d AS dy,
       |    dx.d * (CASE WHEN dy.d = 0 THEN 2 ELSE 1 END) AS kx,
       |    dy.d * (CASE WHEN dx.d = 0 THEN 2 ELSE 1 END) AS ky
       |  FROM (SELECT unnest([-1, 0, 1]) AS d) dx,
       |       (SELECT unnest([-1, 0, 1]) AS d) dy),
       |conv AS (
       |  SELECT n.doc_id, cx.x, cy.y,
       |    sum(k.kx * n.g) AS gx, sum(k.ky * n.g) AS gy
       |  FROM (SELECT unnest(range(1, 15)) AS x) cx,
       |       (SELECT unnest(range(1, 11)) AS y) cy, kern k
       |  JOIN gray n ON n.x = cx.x + k.dx AND n.y = cy.y + k.dy
       |  GROUP BY 1, 2, 3),
       |mag AS (
       |  SELECT doc_id, x, y, abs(gx) + abs(gy) AS mag FROM conv),
       |agg AS (SELECT doc_id, sum(mag) AS energy FROM mag GROUP BY 1),
       |best AS (
       |  SELECT doc_id, mag, x, y FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY mag DESC, y, x) AS rn FROM mag) r
       |  WHERE rn = 1)
       |SELECT a.doc_id, CAST(a.energy AS BIGINT) AS edge_energy,
       |  CAST(b.mag AS BIGINT) AS max_mag, CAST(b.x AS BIGINT) AS max_x,
       |  CAST(b.y AS BIGINT) AS max_y
       |FROM agg a JOIN best b USING (doc_id)
       |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val (energy, maxMag, mx, my) = sobelPpm(syntheticPpm(id))
        (id, energy, maxMag, mx.toLong, my.toLong)
      })
      .toDF("doc_id", "edge_energy", "max_mag", "max_x", "max_y")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm16
  /** Histogram equalization of a P6 PPM on the integer gray channel
    * `(r+g+b) DIV 3`: remap each level v to
    * `(cdf(v) − cdf_min)·255 DIV (n − cdf_min)` — the classic global
    * tone-mapping normalisation, entirely in integer arithmetic (a
    * constant image, `n == cdf_min`, maps to 0 by convention). Returns
    * (levels before, levels after, min/max after, Σ remapped). */
  def equalizePpm(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val (w, h, off) = ppmHeader(bytes)
    val n = w * h
    val gray = Array.tabulate(n) { p =>
      ((bytes(off + p * 3) & 0xff) + (bytes(off + p * 3 + 1) & 0xff) +
        (bytes(off + p * 3 + 2) & 0xff)) / 3
    }
    val hist = new Array[Int](256)
    gray.foreach(hist(_) += 1)
    val cdf = hist.scanLeft(0)(_ + _).tail // inclusive cdf per level
    val lowest = gray.min
    val cdfMin = cdf(lowest)
    val denom = n - cdfMin
    def remap(v: Int): Long =
      if (denom == 0) 0L else (cdf(v) - cdfMin).toLong * 255 / denom
    val present = (0 until 256).filter(hist(_) > 0)
    val after = present.map(v => (remap(v), hist(v)))
    (present.size.toLong, after.map(_._1).distinct.size.toLong,
      after.map(_._1).min, after.map(_._1).max,
      after.map { case (v2, c) => v2 * c }.sum)
  }

  /** Histogram equalization over the image corpus — the GLOBAL
    * tone-mapping class (mm15 reads neighborhoods, this reads the
    * image-wide intensity DISTRIBUTION): per even-doc PPM, the level
    * count before/after, the post-map range, and the remapped checksum.
    * Integer end to end, so the whole report hash-matches; the DuckDB
    * twin replays the pixel LCG, folds gray per pixel, takes the cdf as
    * a doc-keyed window sum over levels, and applies the identical
    * floor remap. `CodecSpec` pins the laws the oracle can't state:
    * constant → 0, any 2+-level image stretches to [0, 255], and the
    * map is monotone (level order preserved). Map-only per image at
    * scale; the histogram (≤256 rows/doc) is the only state. */
  val mm16 = Q("mm16_hist_equalize",
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM lcg WHERE i < 575),
       |g AS (
       |  SELECT doc_id, i // 3 AS p,
       |    CAST(sum(CAST(state // 72057594037927936 AS BIGINT)) // 3
       |      AS BIGINT) AS v
       |  FROM lcg GROUP BY 1, 2),
       |hist AS (SELECT doc_id, v, count(*) AS c FROM g GROUP BY 1, 2),
       |cdf AS (
       |  SELECT doc_id, v, c,
       |    sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS cdf
       |  FROM hist),
       |mn AS (SELECT doc_id, min(cdf) AS cdfmin FROM cdf GROUP BY 1),
       |rm AS (
       |  SELECT c.doc_id, c.v, c.c,
       |    CASE WHEN 192 - m.cdfmin = 0 THEN 0
       |         ELSE (c.cdf - m.cdfmin) * 255 // (192 - m.cdfmin) END AS v2
       |  FROM cdf c JOIN mn m ON m.doc_id = c.doc_id)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_levels_before,
       |  CAST(count(DISTINCT v2) AS BIGINT) AS n_levels_after,
       |  CAST(min(v2) AS BIGINT) AS min_after,
       |  CAST(max(v2) AS BIGINT) AS max_after,
       |  CAST(sum(v2 * c) AS BIGINT) AS sum_after
       |FROM rm GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val (lb, la, mn, mx, sm) = equalizePpm(syntheticPpm(id))
        (id, lb, la, mn, mx, sm)
      })
      .toDF("doc_id", "n_levels_before", "n_levels_after", "min_after",
        "max_after", "sum_after")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm17
  /** REAL audio resampling: WAV synth → 3/2 linear-interpolation
    * sample-rate conversion (8 kHz → 12 kHz) → decode of the RESAMPLED
    * bytes. Completes the audio-kernel set (mm04 decode, mm06 framing,
    * mm08 gain+decimate, mm14 correlators) with the INTERPOLATING
    * stage every mixed-rate corpus needs before batching — decimation
    * only ever divides the rate; training audio must meet a target
    * rate exactly. Fully oracled the mm08 way: DuckDB replays the
    * sample LCG and applies the identical integer convex combination
    * `(s[i]·(3−r) + s[i+1]·r) // 3` (sign-split division; i, r from
    * `j·2 divmod 3`; last-sample hold), so interpolation arithmetic,
    * clamping, and the re-encoded payload's stats are all cross-engine
    * bit-exact; Σd² < 2⁵³ keeps the RMS double exact. Per-doc local
    * work in one `mapPartitions` pass — zero shuffle before the final
    * sort, the mm04 dataflow. */
  val mm17 = Q("mm17_wav_resample",
    s"""WITH RECURSIVE ${pcmCte(800)},
       |res AS (
       |  SELECT doc_id, j,
       |    CASE WHEN t < 0 THEN -((-t) // 3) ELSE t // 3 END AS d
       |  FROM (
       |    SELECT p0.doc_id, g.j,
       |      p0.s * (3 - (g.j * 2) % 3) + p1.s * ((g.j * 2) % 3) AS t
       |    FROM (SELECT unnest(range(1200)) AS j) g
       |    JOIN pcm p0 ON p0.i = (g.j * 2) // 3
       |    JOIN pcm p1 ON p1.doc_id = p0.doc_id
       |      AND p1.i = least((g.j * 2) // 3 + 1, 799)))
       |SELECT doc_id, CAST(12000 AS INTEGER) AS sample_rate,
       |  CAST(1200 AS INTEGER) AS n_samples,
       |  CAST(max(abs(d)) AS INTEGER) AS peak,
       |  sqrt(CAST(sum(d * d) AS DOUBLE) / 1200) AS rms
       |FROM res GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val info = decodeWav(resampleWav(syntheticWav(id), 3, 2))
        (id, info.sample_rate, info.n_samples, info.peak, info.rms)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "peak", "rms")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- mm18
  /** Patch side for [[mm18]] (ViT-style square patches). */
  val PatchSide = 4

  /** Patchify a P6 PPM into (w/[[PatchSide]])×(h/[[PatchSide]]) patches
    * of [[PatchSide]]² pixels each: per patch,
    * (row, col, Σ gray, mean gray) with gray = `(r+g+b) DIV 3` (mm16's
    * channel fold) and mean = `Σ DIV side²` — all integer. Patches are
    * emitted in raster order. */
  def patchifyPpm(bytes: Array[Byte]): Seq[(Int, Int, Long, Long)] = {
    val (w, h, off) = ppmHeader(bytes)
    val (pc, prn) = (w / PatchSide, h / PatchSide)
    val sums = new Array[Long](prn * pc)
    var p = 0
    while (p < w * h) {
      val g = ((bytes(off + p * 3) & 0xff) + (bytes(off + p * 3 + 1) & 0xff) +
        (bytes(off + p * 3 + 2) & 0xff)) / 3
      val (x, y) = (p % w, p / w)
      sums((y / PatchSide) * pc + (x / PatchSide)) += g
      p += 1
    }
    val area = PatchSide.toLong * PatchSide
    (0 until prn * pc).map(i =>
      (i / pc, i % pc, sums(i), sums(i) / area))
  }

  /** ViT-style patch extraction (Dosovitskiy et al. 2021) — the
    * image-to-sequence boundary every vision-transformer pipeline
    * crosses: each image column becomes a PATCH TABLE (doc, patch_row,
    * patch_col, Σ gray, mean gray), the serialized token sequence the
    * model trains on, with the per-patch stats that feed downstream
    * normalisation. The one mm-family shape missing before this: mm03
    * samples frames from a TIME axis, mm05/mm10 resample the whole
    * plane — patchify TILES the plane, many rows out per image, raster
    * order pinned.
    *
    * Integer end to end (gray fold DIV 3, mean DIV side²), so the full
    * patch table hash-matches the DuckDB twin, which replays the pixel
    * LCG and groups by the same `(y DIV 4, x DIV 4)` tiling. Scale:
    * map-only per image (`mapPartitions`), 12 bounded rows out per
    * 16×12 image — the output is patch-count-sized and the op never
    * shuffles; at 100 TB the patch table parquet-partitions by doc
    * range like any fact table. */
  val mm18 = Q("mm18_patchify",
    s"""WITH RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM lcg WHERE i < 575),
       |g AS (
       |  SELECT doc_id, i // 3 AS p,
       |    CAST(sum(CAST(state // 72057594037927936 AS BIGINT)) // 3
       |      AS BIGINT) AS v
       |  FROM lcg GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST((p // 16) // $PatchSide AS BIGINT) AS patch_row,
       |  CAST((p % 16) // $PatchSide AS BIGINT) AS patch_col,
       |  CAST(sum(v) AS BIGINT) AS sum_gray,
       |  CAST(sum(v) // ${PatchSide * PatchSide} AS BIGINT) AS mean_gray
       |FROM g GROUP BY 1, 2, 3
       |ORDER BY doc_id, patch_row, patch_col""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        patchifyPpm(syntheticPpm(id)).map { case (r, c, sm, mn) =>
          (id, r.toLong, c.toLong, sm, mn)
        }
      })
      .toDF("doc_id", "patch_row", "patch_col", "sum_gray", "mean_gray")
      .orderBy("doc_id", "patch_row", "patch_col")
  }

  // --------------------------------------------------------------- mm19
  /** Fixed-point DCT-II basis: C[u][x] = round(4096·cos((2x+1)uπ/16)).
    * Computed ONCE via StrictMath (bit-specified on the JVM), then the
    * 64 INTEGERS are the single source of truth for both engines — the
    * oracle gets them as literal VALUES, so no transcendental is ever
    * evaluated cross-engine. */
  private[graft] val DctBasis: Array[Array[Long]] =
    Array.tabulate(8, 8)((u, x) =>
      Math.round(4096.0 *
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)))

  /** Per-document 8×8 integer DCT coefficients: gray = r+g+b over the
    * synthetic PPM, two horizontal blocks from rows 0–7, and
    * `F[u][v] = Σ_{x,y} g·C[u][x]·C[v][y]` in exact Longs (|F| ≤
    * 765·64·4096² ≈ 8.2·10¹⁴ — headroom ×10⁴). */
  private[graft] def dctBlocks(bytes: Array[Byte]): Seq[(Int, Int, Int, Long)] = {
    val (w, h, off) = ppmHeader(bytes)
    require(w >= 16 && h >= 8, s"image too small for 2 DCT blocks: $w x $h")
    def gray(x: Int, y: Int): Long = {
      val p = off + (y * w + x) * 3
      (bytes(p) & 0xff).toLong + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
    }
    for {
      blk <- 0 to 1
      u <- 0 to 7
      v <- 0 to 7
    } yield {
      var f = 0L
      var lx = 0
      while (lx < 8) {
        var y = 0
        while (y < 8) {
          f += gray(blk * 8 + lx, y) * DctBasis(u)(lx) * DctBasis(v)(y)
          y += 1
        }
        lx += 1
      }
      (blk, u, v, f)
    }
  }

  /** 8×8 integer DCT spectrum report — the transform-CODING tier the
    * JPEG/video family (mm09–mm13) stands on, as a measured table: per
    * frequency (u, v), the corpus-wide absolute coefficient mass, its
    * share of total spectral mass in ppm, and the max coefficient.
    * The DCT itself is FIXED-POINT (the [[DctBasis]] integer basis —
    * how every hardware/JPEG integer DCT works), so coefficients are
    * exact Longs and the whole report hash-matches; the DuckDB twin
    * replays the pixel LCG and performs the IDENTICAL Σ g·C·C contraction
    * via two joins against the literal basis table. On this corpus the
    * report MEASURES the textbook facts: DC dominates by orders of
    * magnitude (pixels are non-negative), and the AC mass is flat —
    * white-noise pixels have no spatial correlation to compact, which
    * is exactly why codecs transform RESIDUALS, not raw noise
    * (`CodecSpec` pins DC dominance + AC flatness quantitatively).
    * Scale: per-image work is a fixed 2×64×64 integer contraction in
    * one `mapPartitions` pass (the mm09 codec discipline); the
    * spectrum agg is 64 keys with map-side combine; share_ppm divides
    * through DECIMAL(38)/HUGEINT (the q59 wide-integer convention). */
  /** The mm19 per-block integer DCT as a CTE chain ending in
    * `coef (doc_id, blk, u, v, f)` — shared by the mm19 and mm20
    * oracles (one definition of the transform, no drift). */
  private def dctCoefSql: String = {
    val basisRows = (for (u <- 0 to 7; x <- 0 to 7)
      yield s"($u, $x, ${DctBasis(u)(x)})").mkString(", ")
    s"""RECURSIVE lcg(doc_id, i, state) AS (
       |  SELECT doc_id, 0,
       |    ((CAST(doc_id AS HUGEINT) * $LcgA + $LcgC) % $LcgM
       |     * $LcgA + $LcgC) % $LcgM
       |  FROM documents WHERE doc_id % 4 = 1
       |  UNION ALL
       |  SELECT doc_id, i + 1, (state * $LcgA + $LcgC) % $LcgM
       |  FROM lcg WHERE i < 575),
       |gray AS (
       |  SELECT doc_id, (i // 3) % 16 AS x, i // 48 AS y,
       |    sum(CAST(state // 72057594037927936 AS BIGINT)) AS g
       |  FROM lcg GROUP BY 1, 2, 3),
       |basis(u, x, c) AS (SELECT * FROM (VALUES $basisRows)),
       |coef AS (
       |  SELECT g8.doc_id, g8.blk, cu.u, cv.u AS v,
       |    sum(g8.g * cu.c * cv.c) AS f
       |  FROM (SELECT doc_id, x // 8 AS blk, x % 8 AS lx, y, g
       |        FROM gray WHERE y < 8) g8
       |  JOIN basis cu ON cu.x = g8.lx
       |  JOIN basis cv ON cv.x = g8.y
       |  GROUP BY 1, 2, 3, 4)""".stripMargin
  }

  /** Spark twin of [[dctCoefSql]]: the sampled docs' exact Long DCT
    * coefficients via [[dctBlocks]] in one mapPartitions pass. */
  private def dctCoefDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 4 === 1)
      .select("doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        dctBlocks(syntheticPpm(id)).map { case (blk, u, v, f) =>
          (id, blk, u, v, f)
        }
      })
      .toDF("doc_id", "blk", "u", "v", "f")
  }

  val mm19 = Q("mm19_dct_spectrum", {
    s"""WITH $dctCoefSql,
       |freq AS (
       |  SELECT u, v, sum(abs(f)) AS sum_abs, max(abs(f)) AS max_abs
       |  FROM coef GROUP BY u, v),
       |tot AS (SELECT sum(sum_abs) AS t FROM freq)
       |SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       |  CAST(sum_abs AS BIGINT) AS sum_abs,
       |  CAST(max_abs AS BIGINT) AS max_abs,
       |  CAST(CAST(sum_abs AS HUGEINT) * 1000000 // t AS BIGINT)
       |    AS share_ppm
       |FROM freq CROSS JOIN tot
       |ORDER BY u, v""".stripMargin
  }) { (s, d) =>
    val coef = dctCoefDf(s, d)
    val freq = coef.groupBy("u", "v")
      .agg(sum(abs(col("f"))).as("sum_abs"),
        max(abs(col("f"))).as("max_abs"),
        count(lit(1)).as("n_coef"))
      .localCheckpoint() // 64 rows; read by the guard AND both branches
    // r9 ADVICE: sum_abs is a BIGINT sum whose headroom claim (×10⁴ per
    // coefficient) shrinks linearly with corpus size, and a long-sum
    // wrap in Spark is SILENT (no null, unlike decimal). Prove no wrap
    // was reachable, in-op: Σ|f| ≤ n_coef·max_abs, so if that product
    // fits in a signed 64-bit long the sum cannot have wrapped. The
    // guard reads the 64-row checkpoint artifact, never the corpus.
    freq.collect().foreach { r =>
      val bound = BigInt(r.getLong(r.fieldIndex("n_coef"))) *
        BigInt(r.getLong(r.fieldIndex("max_abs")))
      require(bound <= BigInt(Long.MaxValue),
        s"mm19: n_coef*max_abs = $bound exceeds Long range for frequency " +
          s"(${r.getInt(r.fieldIndex("u"))},${r.getInt(r.fieldIndex("v"))})" +
          " — sum_abs could wrap on this corpus; widen to DECIMAL(38,0)")
    }
    val tot = freq.agg(sum("sum_abs").as("t"))
    freq.crossJoin(broadcast(tot))
      .select(col("u").cast("long"), col("v").cast("long"),
        col("sum_abs").cast("long"),
        col("max_abs").cast("long"),
        expr("CAST(CAST(sum_abs AS DECIMAL(38,0)) * 1000000 DIV t AS BIGINT)")
          .as("share_ppm"))
      .orderBy("u", "v")
  }

  // --------------------------------------------------------------- mm20
  /** JPEG Annex K luminance quantisation table (row u, col v) — the
    * public standard constants. */
  private val JpegQuant: Array[Array[Long]] = Array(
    Array(16, 11, 10, 16, 24, 40, 51, 61),
    Array(12, 12, 14, 19, 26, 58, 60, 55),
    Array(14, 13, 16, 24, 40, 57, 69, 56),
    Array(14, 17, 22, 29, 51, 87, 80, 62),
    Array(18, 22, 37, 56, 68, 109, 103, 77),
    Array(24, 35, 55, 64, 81, 104, 113, 92),
    Array(49, 64, 78, 87, 103, 121, 120, 101),
    Array(72, 92, 95, 98, 112, 100, 103, 99))

  /** JPEG zigzag scan position of frequency (u, v). */
  private val ZigZag: Array[Array[Int]] = Array(
    Array(0, 1, 5, 6, 14, 15, 27, 28),
    Array(2, 4, 7, 13, 16, 26, 29, 42),
    Array(3, 8, 12, 17, 25, 30, 41, 43),
    Array(9, 11, 18, 24, 31, 40, 44, 53),
    Array(10, 19, 23, 32, 39, 45, 52, 54),
    Array(20, 22, 33, 38, 46, 51, 55, 60),
    Array(21, 34, 37, 47, 50, 56, 59, 61),
    Array(35, 36, 48, 49, 57, 58, 62, 63))

  /** Quantisation + zigzag run-length accounting — the two JPEG stages
    * after mm19's DCT, closing the transform-coding story: coefficients
    * divide by the Annex K luminance table (scaled by the 4096² fixed-
    * point basis gain; SIGNED symmetric-truncation division, the q60
    * convention — DuckDB's `//` floors negatives), then scan in zigzag
    * order, and each block reports what an entropy coder would see:
    * surviving (nonzero) coefficients, the end-of-block position, and
    * the longest zero run. On white-noise pixels quantisation kills
    * almost nothing low-frequency — the measured counterpart of mm19's
    * AC-flatness note (codecs transform residuals, not noise), and
    * `CodecSpec` pins DC survival + the RLE accounting laws. Dataflow:
    * mm19's one-pass coefficient table joins the BROADCAST 64-row
    * (quant, zigzag) literal table; run lengths are one lag window
    * KEYED by (doc, blk) over ≤ 64 rows per key; all-zero blocks
    * re-attach with eob = -1 and a full-length run. All integer. */
  val mm20 = Q("mm20_quant_zigzag_rle", {
    val qtRows = (for (u <- 0 to 7; v <- 0 to 7)
      yield s"($u, $v, ${JpegQuant(u)(v)}, ${ZigZag(u)(v)})").mkString(", ")
    s"""WITH $dctCoefSql,
       |qt(u, v, qv, zz) AS (SELECT * FROM (VALUES $qtRows)),
       |qc AS (
       |  SELECT c.doc_id, c.blk, qt.zz,
       |    CASE WHEN c.f >= 0 THEN c.f // (qt.qv * 16777216)
       |         ELSE -((-c.f) // (qt.qv * 16777216)) END AS q
       |  FROM coef c JOIN qt ON qt.u = c.u AND qt.v = c.v),
       |nz AS (
       |  SELECT doc_id, blk, zz,
       |    lag(zz) OVER (PARTITION BY doc_id, blk ORDER BY zz) AS prev
       |  FROM qc WHERE q <> 0),
       |st AS (
       |  SELECT doc_id, blk, count(*) AS n_nonzero, max(zz) AS eob,
       |    greatest(max(zz - coalesce(prev, -1) - 1), 63 - max(zz))
       |      AS max_zero_run
       |  FROM nz GROUP BY doc_id, blk),
       |blocks AS (SELECT DISTINCT doc_id, blk FROM qc)
       |SELECT b.doc_id, CAST(b.blk AS BIGINT) AS blk,
       |  CAST(coalesce(st.n_nonzero, 0) AS BIGINT) AS n_nonzero,
       |  CAST(coalesce(st.eob, -1) AS BIGINT) AS eob,
       |  CAST(coalesce(st.max_zero_run, 64) AS BIGINT) AS max_zero_run
       |FROM blocks b LEFT JOIN st ON st.doc_id = b.doc_id AND st.blk = b.blk
       |ORDER BY b.doc_id, b.blk""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val qt = (for (u <- 0 to 7; v <- 0 to 7)
      yield (u, v, JpegQuant(u)(v), ZigZag(u)(v)))
      .toDF("u", "v", "qv", "zz")
    val qc = dctCoefDf(s, d).join(broadcast(qt), Seq("u", "v"))
      .selectExpr("doc_id", "blk", "zz",
        """CASE WHEN f >= 0 THEN f div (qv * 16777216)
          | ELSE -((-f) div (qv * 16777216)) END AS q"""
          .stripMargin.replace("\n", " "))
      .localCheckpoint() // read by the nonzero stats AND the block list
    val w = Window.partitionBy("doc_id", "blk").orderBy("zz")
    val st = qc.filter(col("q") =!= 0)
      .withColumn("prev", lag("zz", 1).over(w))
      .groupBy("doc_id", "blk")
      .agg(count(lit(1)).as("n_nonzero"), max("zz").as("eob"),
        greatest(max(expr("zz - coalesce(prev, -1) - 1")),
          lit(63) - max(col("zz"))).as("max_zero_run"))
    qc.select("doc_id", "blk").distinct()
      .join(st, Seq("doc_id", "blk"), "left")
      .selectExpr("doc_id", "CAST(blk AS BIGINT) AS blk",
        "CAST(coalesce(n_nonzero, 0) AS BIGINT) AS n_nonzero",
        "CAST(coalesce(eob, -1) AS BIGINT) AS eob",
        "CAST(coalesce(max_zero_run, 64) AS BIGINT) AS max_zero_run")
      .orderBy("doc_id", "blk")
  }

  def all: Seq[Q] = Seq(mm01, mm02, mm03, mm04, mm05, mm06, mm07, mm08, mm09,
    mm10, mm11, mm12, mm13, mm14, mm15, mm16, mm17, mm18, mm19, mm20)
}

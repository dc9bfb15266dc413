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
  * Two tiers:
  *  - REAL codecs (mm04–mm06): WAV and PPM need no external library, so
  *    the engine genuinely decodes them — RIFF/fmt header validation,
  *    PCM16 peak/RMS, P6 header parse, nearest-neighbour resize with
  *    actual pixel indexing, per-window signal stats. Synthesis is
  *    deterministic (`StrictMath`, LCG) so results are reproducible.
  *  - STUB tier (mm02/mm03): stands in for heavyweight codecs
  *    (JPEG/MP3) whose libraries don't exist in this container;
  *    [[decodeStub]] derives deterministic features from the raw bytes.
  *    The partitioning, schema, signature, and batch shape around it are
  *    real and spec-pinned.
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

  /** STUB decoder: a real implementation would decode the image/audio and
    * emit embeddings/frames; this stand-in folds the bytes into 4
    * deterministic doubles. Same signature, same batch shape. */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val acc = new Array[Double](4)
    var i = 0
    while (i < content.length) {
      acc(i % 4) += (content(i) & 0xff) / 255.0
      i += 1
    }
    acc
  }

  /** Feature extraction as a per-partition iterator transform. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition init point: real decoders/codecs load once here.
      rows.map { r =>
        val f = decodeStub(r.content)
        MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong,
          f(0), f(1), f(2), f(3))
      }
    }
  }

  case class Frame(doc_id: Long, frame_no: Int, n_bytes: Long, f0: Double)

  /** STUB resize: a real implementation would decode, scale to (w, h),
    * re-encode; the stand-in deterministically folds the bytes to the
    * target "pixel count". Same signature and per-row shape. */
  def resizeStub(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(w * h, 64))
    var i = 0
    while (i < out.length) {
      out(i) = content(i % content.length)
      i += 1
    }
    out
  }

  /** Frame sampling as the 1→N iterator transform (the reference's UDTF
    * shape generalised): each media row yields `n` evenly-spaced
    * "frames". A real decoder would seek keyframes; the stub derives
    * each frame's feature from a byte stride. flatMap keeps the operator
    * streaming — no per-document materialisation. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      (0 until n).iterator.map { k =>
        val stride = math.max(1, r.content.length / n)
        val b = r.content(math.min(k * stride, r.content.length - 1)) & 0xff
        Frame(r.doc_id, k, r.content.length.toLong, b / 255.0)
      }
    }
  }

  // ------------------------------------------------------ real codecs
  // The stubs above stand in for heavyweight codecs (JPEG/MP3) whose
  // libraries don't exist in this container. These two formats, though,
  // need no library — WAV is a 44-byte header over PCM16LE and PPM (P6)
  // is an ASCII header over RGB bytes — so the engine decodes them FOR
  // REAL: header validation, sample/pixel math, resize, frame windows.

  /** Valid mono PCM16LE WAV: RIFF/fmt/data chunks + a seed-derived tone.
    * `StrictMath.sin` keeps the samples bit-identical across JVMs. */
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
    val amp = 4000.0 + (seed % 8000).abs
    val freq = 100.0 + (seed % 400).abs
    var i = 0
    while (i < nSamples) {
      buf.putShort((amp * StrictMath.sin(
        2.0 * StrictMath.PI * freq * i / sampleRate)).toShort)
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
    require(bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (!Character.isDigit(bytes(pos))) pos += 1
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

  /** Decode + feature-extract through the mapPartitions path (stubbed
    * decode → rows-only check; the spec pins exact feature values). */
  val mm02 = Q.noOracle("mm02_decode_features") { (s, d) =>
    import s.implicits._
    val media = mediaFrame(Tables.documents(s, d)).as[MediaRow]
    extractFeatures(media).toDF().orderBy("doc_id")
  }

  /** Frame sampling over the media table: 1→N flatMap, rows-only check
    * (the spec pins exact frames). */
  val mm03 = Q.noOracle("mm03_frame_sample") { (s, d) =>
    import s.implicits._
    val media = mediaFrame(Tables.documents(s, d)).as[MediaRow]
    sampleFrames(media, 4).toDF().orderBy("doc_id", "frame_no")
  }

  /** REAL audio decode path: a valid WAV per audio doc (deterministic
    * tone), decoded — header validation + peak/RMS — in the same
    * mapPartitions shape mm02 uses for the stubbed codecs. */
  val mm04 = Q.noOracle("mm04_wav_decode") { (s, d) =>
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
    * pixel indexing) → decode of the RESIZED bytes → channel means. */
  val mm05 = Q.noOracle("mm05_ppm_resize") { (s, d) =>
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
    * peak + RMS — the 1→N flatMap with actual signal math. */
  val mm06 = Q.noOracle("mm06_wav_frames") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
      .select("doc_id").as[Long]
      .flatMap(id => wavFrames(id, syntheticWav(id), 4))
      .toDF()
      .orderBy("doc_id", "frame_no")
  }

  def all: Seq[Q] = Seq(mm01, mm02, mm03, mm04, mm05, mm06)
}

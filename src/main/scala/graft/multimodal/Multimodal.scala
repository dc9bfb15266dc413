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
  * STUB: no image/audio libraries exist in this container, so
  * [[decodeStub]] derives a deterministic 4-float "feature vector" from
  * the raw bytes. It is explicitly a stand-in — the partitioning, schema,
  * signature, and batch shape around it are the real deliverable and are
  * what the tests pin.
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

  def all: Seq[Q] = Seq(mm01, mm02, mm03)
}

package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment) with a deterministic fake: real Spark-side schema,
  * partitioning, and batch iteration — fake pixels. Swap
  * [[decodeStub]]'s body for a real decoder (e.g. TwelveMonkeys/FFmpeg
  * via JNI) without touching the plan shape.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, media: Array[Byte], mime: String)
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
                       content_hash: String)

  /** STUB decoder: derives "dimensions" deterministically from the
    * payload instead of decoding it. Replace with a real codec call. */
  private def decodeStub(m: MediaIn): MediaMeta = {
    val md = MessageDigest.getInstance("MD5")
    val hash = md.digest(m.media).map(b => f"${b & 0xff}%02x").mkString
    val n = m.media.length
    MediaMeta(m.doc_id, n, n % 640, (n * 7) % 480, hash)
  }

  /** Batched per-partition decode: one decoder instance per partition
    * (the `MessageDigest` stands in for an expensive codec handle),
    * streaming iterator — the `mapInPandas`-equivalent shape in Scala. */
  def extractMeta(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it => it.map(decodeStub) }.toDF()
  }

  /** Wrap a text table as a fake media table (payload = utf-8 bytes) —
    * test fixture for the plumbing. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      lit("application/octet-stream").as("mime"))

  case class FrameOut(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling for video-like payloads: every `stride`-th fixed-
    * width frame, one output row per sampled frame. The frame SLICING
    * is real (per-partition streaming flatMap, the generator shape a
    * video pipeline needs — rows out ≫ rows in without a shuffle);
    * "frame" here is a fixed `frameBytes` payload window standing in
    * for a real demuxer. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int)
                 (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].flatMap { m =>
      val nFrames = m.media.length / frameBytes
      (0 until nFrames by stride).iterator.map { i =>
        FrameOut(m.doc_id, i, java.util.Arrays.copyOfRange(
          m.media, i * frameBytes, (i + 1) * frameBytes))
      }
    }.toDF()
  }

  /** Fit-in-box resize arithmetic over the stub-decoded dimensions:
    * IEEE double scale + floor, so any engine reproduces the output
    * dims bit-exactly; the pixel resample itself is the stubbed step. */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int)
                (implicit spark: SparkSession): DataFrame = {
    val srcW = length(col("media")) % 640
    val srcH = (length(col("media")) * 7) % 480
    val scale = least(lit(targetW).cast("double") / srcW,
      lit(targetH).cast("double") / srcH)
    media.select(col("doc_id"), srcW.as("src_w"), srcH.as("src_h"),
      when(srcW === 0 || srcH === 0, 0)
        .otherwise(floor(srcW * scale).cast("int")).as("out_w"),
      when(srcW === 0 || srcH === 0, 0)
        .otherwise(floor(srcH * scale).cast("int")).as("out_h"))
  }

  /** Feature-extraction stub: 4 independent 32-bit features from the
    * payload hash — the embedding-column shape (fixed-width numeric
    * vector per row) with deterministic, oracle-checkable values. */
  def featureVector(media: DataFrame): DataFrame = {
    val h = md5(col("media"))
    val feats = (0 until 4).map(k =>
      conv(substring(h, 8 * k + 1, 8), 16, 10).cast("long").as(s"f$k"))
    media.select(col("doc_id") +: feats: _*)
  }
}

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
}

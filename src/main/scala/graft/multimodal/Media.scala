package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal columns: images/audio/video as opaque `binary` content
  * plus typed metadata (SURVEY.md Part-B "multimodal columns").
  *
  * Spark-side plumbing is REAL — binary schema, typed Dataset boundary,
  * `mapPartitions` with explicit micro-batching (the JVM analogue of
  * arrow-batched `mapInPandas`: the codec sees a batch at a time so a
  * native decoder could amortize per-batch setup), partition-preserving
  * narrow execution. The CODEC is a deterministic STUB: this container
  * has no image/audio libraries, so `decodeFrameCount` fakes a decode
  * with a documented byte-length formula and `sniffMime` reads real
  * magic bytes. A production codec drops in behind [[MediaCodec]]
  * without touching the pipeline.
  */
final case class MediaRecord(
    media_id: Long, kind: String, content: Array[Byte], source: String)

final case class MediaFeatures(
    media_id: Long, kind: String, mime: String,
    byte_len: Long, content_hash: String, frames: Long)

final case class FrameSample(media_id: Long, frame_idx: Long, frame_hash: String)

trait MediaCodec extends Serializable {
  def sniffMime(content: Array[Byte]): String
  /** STUB boundary — a real impl decodes; the fake derives a
    * deterministic count from content size. */
  def decodeFrameCount(content: Array[Byte]): Long
  /** STUB boundary — a real impl decodes frame `idx` and hashes its
    * pixels; the fake hashes content + index so each frame has a
    * distinct, SQL-mirrorable fingerprint. */
  def frameHash(content: Array[Byte], idx: Long): String

  /** Per-frame CONTENT fingerprint — unlike [[frameHash]] (which keys
    * whole-content + index and so is unique per media), this hashes the
    * frame's OWN byte slice `[idx*frameSize, (idx+1)*frameSize)`, so
    * media sharing byte ranges share fingerprints — the property
    * near-duplicate detection needs. A real codec would hash decoded
    * pixels (a perceptual hash slots in here); the byte-slice default
    * is the deterministic, SQL-mirrorable stand-in
    * (`md5(substr(content, idx*fs+1, fs))`). */
  def frameFingerprint(content: Array[Byte], idx: Long, frameSize: Int): String = {
    val start = (idx * frameSize).toInt
    val end = math.min(content.length, start + frameSize)
    Media.md5hex(java.util.Arrays.copyOfRange(content, start, end))
  }
}

/** Deterministic stand-in codec (see class doc). */
object FakeCodec extends MediaCodec {
  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private val JpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  private val RiffMagic = "RIFF".getBytes("US-ASCII")

  override def sniffMime(content: Array[Byte]): String =
    if (content == null || content.isEmpty) "application/octet-stream"
    else if (content.startsWith(PngMagic)) "image/png"
    else if (content.startsWith(JpegMagic)) "image/jpeg"
    else if (content.startsWith(RiffMagic)) "audio/wav"
    else if (content.forall(b => b == 9 || b == 10 || b == 13 || (b >= 32 && b < 127)))
      "text/plain"
    else "application/octet-stream"

  /** Fake "decode": one frame per 256 bytes, minimum 1 — deterministic
    * and SQL-mirrorable (`len // 256 + 1`). */
  override def decodeFrameCount(content: Array[Byte]): Long =
    if (content == null) 1L else content.length / 256L + 1L

  /** Fake frame fingerprint: md5 of content ++ ":idx" — mirrorable as
    * `md5(text || ':' || idx)`. */
  override def frameHash(content: Array[Byte], idx: Long): String = {
    val suffix = s":$idx".getBytes("UTF-8")
    val all = new Array[Byte]((if (content == null) 0 else content.length) + suffix.length)
    if (content != null) System.arraycopy(content, 0, all, 0, content.length)
    System.arraycopy(suffix, 0, all, (if (content == null) 0 else content.length), suffix.length)
    Media.md5hex(all)
  }
}

object Media {

  private[multimodal] def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Frame sampling — the ONE-TO-MANY media op (m01's features are
    * 1:1): every `stride`-th frame of each record becomes its own row,
    * fingerprinted by the codec. Same batched-mapPartitions boundary as
    * [[features]], flatMap instead of map — narrow, no shuffle; output
    * volume = frames/stride, controlled by the caller. */
  def sampleFrames(
      media: Dataset[MediaRecord], codec: MediaCodec,
      stride: Int, batchSize: Int = 64): Dataset[FrameSample] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val n = codec.decodeFrameCount(r.content)
          (0L until n).filter(_ % stride == 0).map { i =>
            FrameSample(r.media_id, i, codec.frameHash(r.content, i))
          }
        }
      }
    }
  }

  /** Content-addressed frame fingerprints: every `frameSize`-byte frame
    * of each record becomes a row hashed by ITS OWN bytes
    * ([[MediaCodec.frameFingerprint]]) — the inverted-index input for
    * [[nearDupPairs]]. Same batched-mapPartitions codec boundary as
    * [[sampleFrames]]; narrow, no shuffle; `ceil(len/frameSize)` rows
    * per record (empty content yields none). */
  def fingerprintFrames(
      media: Dataset[MediaRecord], codec: MediaCodec,
      frameSize: Int, batchSize: Int = 64): Dataset[FrameSample] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val len = if (r.content == null) 0L else r.content.length.toLong
          val n = (len + frameSize - 1) / frameSize
          (0L until n).map { i =>
            FrameSample(r.media_id, i, codec.frameFingerprint(r.content, i, frameSize))
          }
        }
      }
    }
  }

  /** Near-duplicate media pairs by frame-fingerprint Jaccard — the
    * standard video/image dedup design (per-frame fingerprints → an
    * inverted index on the fingerprint → candidate pairs only where a
    * frame is SHARED → exact overlap scoring). Never all-pairs: the
    * frame-hash groupBy is the only big shuffle, candidate volume is
    * bounded by actually-colliding frames, and the per-media set sizes
    * are a dim-sized aggregate — d04's lossless-candidate shape applied
    * to binary media. Returns (ma, mb, shared, na, nb, jaccard) with
    * `jaccard = |A∩B| / |A∪B|` over DISTINCT fingerprints, filtered to
    * `>= threshold`. */
  def nearDupPairs(frames: Dataset[FrameSample], threshold: Double)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val f = frames.toDF().select(col("media_id"), col("frame_hash")).distinct()
    val sizes = f.groupBy("media_id").agg(count(lit(1)).as("n"))
    val shared = f.as("a")
      .join(f.as("b"),
        col("a.frame_hash") === col("b.frame_hash") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("ma"), col("b.media_id").as("mb"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("media_id").as("ma"), col("n").as("na")), Seq("ma"))
      .join(sizes.select(col("media_id").as("mb"), col("n").as("nb")), Seq("mb"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("ma", "mb", "shared", "na", "nb", "jaccard")
  }

  /** Batched per-partition feature extraction. Narrow (no shuffle),
    * codec invoked per micro-batch of `batchSize` records. */
  def features(
      media: Dataset[MediaRecord], codec: MediaCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec boundary: a native decoder initializes once here
        batch.iterator.map { r =>
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            mime = codec.sniffMime(r.content),
            byte_len = if (r.content == null) 0L else r.content.length.toLong,
            content_hash = md5hex(if (r.content == null) Array.empty else r.content),
            frames = codec.decodeFrameCount(r.content))
        }
      }
    }
  }
}

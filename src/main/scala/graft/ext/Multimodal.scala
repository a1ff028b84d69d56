package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video carried as opaque
  * `binary` payloads with typed metadata, processed in partition-sized
  * batches. The Spark-side mechanics — schema, partitioning, batch
  * iterator shape, explode of per-frame rows — are real and tested;
  * the actual codec call is STUBBED (this container has no image/audio
  * libraries) behind [[MediaCodec.decodeStub]], a deterministic fake
  * with the same signature a JNI/codec-backed implementation would
  * have.
  *
  * Scale: payloads never pass through a shuffle — decode/feature
  * extraction is mapPartitions (narrow); only the small extracted
  * metadata/features move. That is the invariant that matters at
  * 100 TB of media.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)
  case class FrameRow(media_id: Long, frame_idx: Int, frame_hash: Long)

  object MediaCodec {
    /** Portable 60-bit hash (first 15 hex chars of md5) — same
      * construction as [[Dedup.portableHash60]], evaluated here on the
      * executor over raw bytes so the DuckDB oracle can recompute the
      * stub's outputs exactly (md5 of a VARCHAR hashes its UTF-8
      * bytes, which is precisely the payload). */
    private def hash60(bytes: Array[Byte]): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }

    /** STUB — stands in for a real image/audio decoder (???: swap for
      * an actual codec; e.g. javax.imageio / ffmpeg JNI). Derives
      * deterministic pseudo-metadata from the payload bytes so tests
      * and the cross-engine oracle can assert exact values. */
    def decodeStub(m: MediaRow): MediaFeatures = {
      val len = m.payload.length
      val cks = hash60(m.payload)
      MediaFeatures(m.media_id, m.kind, len,
        width = 16 + (cks % 64).toInt,
        height = 16 + ((cks >> 8) % 64).toInt,
        n_frames = 1 + math.floorMod(len, 8),
        checksum = cks)
    }

    /** STUB frame sampler — real impl would seek/decode keyframes.
      * frame_hash XORs the payload checksum with a per-index portable
      * hash (no multiplication: 64-bit wrap-around isn't portable to
      * engines with strict overflow checks). */
    def sampleFramesStub(f: MediaFeatures, stride: Int): Seq[FrameRow] =
      (0 until f.n_frames by stride).map(i =>
        FrameRow(f.media_id, i, f.checksum ^ hash60(s"f|$i".getBytes("UTF-8"))))

    /** STUB resize — real impl would rescale pixel data; the stub
      * rescales the metadata and re-derives the checksum the way a
      * real resampler changes bytes deterministically. */
    def resizeStub(f: MediaFeatures, maxDim: Int): MediaFeatures = {
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt),
        checksum = f.checksum ^ (maxDim.toLong << 32))
    }
  }

  /** Synthesize a media table from the documents corpus: payload =
    * UTF-8 bytes standing in for encoded media. Kind rotates through
    * the three modalities. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batch decode: one codec context per partition (the expensive init
    * a real codec needs), then per-row decode — the canonical
    * mapPartitions shape. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: acquire codec/thread-local buffers here, once
      rows.map(MediaCodec.decodeStub)
    }
  }

  /** Per-frame explode with a sampling stride. */
  def sampleFrames(feats: Dataset[MediaFeatures], stride: Int = 2): Dataset[FrameRow] = {
    import feats.sparkSession.implicits._
    feats.flatMap(f => MediaCodec.sampleFramesStub(f, stride))
  }

  /** Bounded-dimension resize pass (narrow map — payload metadata only
    * moves; at scale the resized bytes would be written back
    * partitioned by kind). */
  def resizeAll(feats: Dataset[MediaFeatures], maxDim: Int = 32): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map(MediaCodec.resizeStub(_, maxDim))
  }
}

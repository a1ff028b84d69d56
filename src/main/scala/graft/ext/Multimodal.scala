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
    /** STUB — stands in for a real image/audio decoder (???: swap for
      * an actual codec; e.g. javax.imageio / ffmpeg JNI). Derives
      * deterministic pseudo-metadata from the payload bytes so tests
      * can assert exact values. */
    def decodeStub(m: MediaRow): MediaFeatures = {
      val len = m.payload.length
      val cks = m.payload.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
      MediaFeatures(m.media_id, m.kind, len,
        width = 16 + math.floorMod(cks, 64).toInt,
        height = 16 + math.floorMod(cks >> 8, 64).toInt,
        n_frames = 1 + math.floorMod(len, 8),
        checksum = cks)
    }

    /** STUB frame sampler — real impl would seek/decode keyframes. */
    def sampleFramesStub(f: MediaFeatures, stride: Int): Seq[FrameRow] =
      (0 until f.n_frames by stride).map(i =>
        FrameRow(f.media_id, i, f.checksum ^ (0x9E3779B97F4A7C15L * (i + 1))))

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

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: an opaque binary payload plus typed metadata —
  * the storage shape for images/audio/video in a training-data pipeline.
  * At rest this is a parquet BINARY column next to scalar metadata, so
  * scans prune metadata-only queries down to the small columns and only
  * feature-extraction jobs pay to read payload bytes.
  */
case class MediaRecord(
    media_id: Long,
    doc_id: Long,
    kind: String, // image | audio | video
    format: String, // jpeg | wav | mp4 ...
    width: Int,
    height: Int,
    payload: Array[Byte]
)

/** Output of the (stubbed) decoder: fixed-width feature vector. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int, features: Array[Float])

/** Output of the (stubbed) resize: payload transformed, metadata updated. */
case class ResizedMedia(media_id: Long, width: Int, height: Int, payload: Array[Byte])

/** Multimodal-column plumbing: real Spark schema, partitioning, and
  * per-partition batch shape; the codec call itself is STUBBED (this
  * container has no image/audio libraries) behind `decodeStub` — swap
  * that one function for a JNI/javacpp codec binding in production.
  *
  * Execution model notes (the part that must be right at 100 TB):
  *  - mapPartitions, not per-row UDFs: codec init (the expensive part of
  *    real decoders) happens once per partition, then streams the
  *    iterator — the Scala analog of batched pandas UDFs.
  *  - the pipeline is Dataset[T]-typed end to end, so Catalyst still
  *    prunes/pushes around it and the shapes are checked at compile time.
  *  - payload bytes never hit a shuffle here; repartitioning (when asked
  *    for) happens BEFORE decode on the narrow metadata projection.
  */
object Multimodal {

  /** Deterministic synthetic media over the documents table: payload =
    * UTF-8 text bytes standing in for encoded image data; metadata
    * derived from doc stats. Lets the whole pipeline run, end to end, on
    * the standard testdata. */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        col("doc_id"),
        lit("image").as("kind"),
        lit("fake-rgb").as("format"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload")
      )
      .as[MediaRecord]
  }

  /** ??? in spirit — the REAL decoder goes here. This deterministic stand-
    * in (byte histogram over 8 buckets, L1-normalized) keeps the pipeline
    * runnable + testable; it preserves the real contract: bytes in,
    * fixed-width float vector out, pure function. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Feature extraction with per-partition batching (codec init once per
    * partition, then stream). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // [codec init would happen HERE, once per partition]
      records.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length, decodeStub(r.payload))
      }
    }
  }

  /** Resize stub: halves dimensions, truncates payload proportionally —
    * the real implementation swaps the body, the plumbing stays. */
  def resize(media: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        var (w, h) = (r.width, r.height)
        var p = r.payload
        while (math.max(w, h) > maxDim) {
          w /= 2; h /= 2
          p = p.take(math.max(1, p.length / 2))
        }
        ResizedMedia(r.media_id, w, h, p)
      }
    }
  }

  /** Frame sampling stub for video-kind records: every k-th byte window
    * stands in for every k-th frame. */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.flatMap { r =>
        val frameSize = math.max(1, r.width)
        r.payload.grouped(frameSize).zipWithIndex.collect {
          case (frame, idx) if idx % everyK == 0 => (r.media_id, idx, frame)
        }
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Metadata-only stats — must NOT read payload bytes (column pruning
    * keeps the scan narrow; asserted in MultimodalSpec). */
  def metaStats(media: Dataset[MediaRecord]): DataFrame =
    media.groupBy("kind", "format")
      .agg(
        count(lit(1)).as("n_media"),
        avg(col("width")).as("avg_width"),
        avg(col("height")).as("avg_height")
      )
      .orderBy("kind", "format")
}

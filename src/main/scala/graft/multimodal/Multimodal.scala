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
  * per-partition batch shape. The decoder is REAL for binary Netpbm
  * images (P6/P5 — a public, zero-dependency raster format this
  * container can decode in pure JVM code: header parse + pixel-stats
  * features, `decodeNetpbm`); formats with no JVM codec here (jpeg, wav,
  * mp4, ...) fall to the deterministic `decodeStub` stand-in — swap that
  * one function for a JNI/javacpp codec binding in production. Dispatch
  * is per-record on the declared format, with malformed payloads
  * degrading to the stub rather than failing the partition.
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

  /** Stand-in decoder for formats with no JVM codec in this container
    * (deterministic byte histogram over 8 buckets, L1-normalized). It
    * preserves the real contract — bytes in, fixed-width float vector
    * out, pure function — and is the fallback when a declared-real
    * payload fails to parse. */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** REAL decoder for binary Netpbm images — P6 (RGB) and P5 (gray), the
    * public zero-dependency raster format. Parses the header (magic,
    * whitespace/`#`-comment runs, width/height/maxval, single whitespace
    * before the raster per the spec) and returns
    * (format, width, height, maxval, rasterOffset), or None when the
    * bytes aren't a well-formed header. */
  private[graft] def parseNetpbmHeader(
      b: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P'.toByte) return None
    val kind = b(1) match {
      case '6' => "ppm"
      case '5' => "pgm"
      case _   => return None
    }
    var i = 2
    def readInt(): Option[Int] = {
      var inComment = false
      while (i < b.length &&
        (inComment || b(i).toChar.isWhitespace || b(i) == '#'.toByte)) {
        if (b(i) == '#'.toByte) inComment = true
        else if (b(i) == '\n'.toByte) inComment = false
        i += 1
      }
      val st = i
      while (i < b.length && b(i) >= '0'.toByte && b(i) <= '9'.toByte) i += 1
      if (i == st || i - st > 9) None
      else Some(new String(b, st, i - st, "US-ASCII").toInt)
    }
    for {
      w  <- readInt()
      h  <- readInt()
      mx <- readInt()
      if w > 0 && h > 0 && mx > 0 && mx <= 255 && i < b.length &&
        b(i).toChar.isWhitespace
    } yield (kind, w, h, mx, i + 1)
  }

  /** Decode a Netpbm payload to the 8-wide pixel-stats feature vector:
    * [mean R, mean G, mean B, luminance stddev, min lum, max lum,
    *  aspect w/(w+h), maxval/255] — all channel values maxval-normalized
    * to [0,1]. None when the header or raster length is malformed. */
  private[graft] def decodeNetpbm(payload: Array[Byte]): Option[Array[Float]] =
    parseNetpbmHeader(payload).flatMap { case (kind, w, h, mx, off) =>
      val ch = if (kind == "ppm") 3 else 1
      val n = w.toLong * h
      if (payload.length - off < n * ch) None
      else {
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var (sl, sl2) = (0.0, 0.0)
        var (mn, mxl) = (1.0, 0.0)
        var p = off
        var k = 0L
        while (k < n) {
          val (r, g, bl) =
            if (ch == 3) (payload(p) & 0xff, payload(p + 1) & 0xff, payload(p + 2) & 0xff)
            else { val v = payload(p) & 0xff; (v, v, v) }
          p += ch
          val (rf, gf, bf) = (r.toDouble / mx, g.toDouble / mx, bl.toDouble / mx)
          sr += rf; sg += gf; sb += bf
          val lum = 0.299 * rf + 0.587 * gf + 0.114 * bf
          sl += lum; sl2 += lum * lum
          if (lum < mn) mn = lum
          if (lum > mxl) mxl = lum
          k += 1
        }
        val nd = n.toDouble
        val meanL = sl / nd
        val varL = math.max(0.0, sl2 / nd - meanL * meanL)
        Some(Array(
          (sr / nd).toFloat, (sg / nd).toFloat, (sb / nd).toFloat,
          math.sqrt(varL).toFloat, mn.toFloat, mxl.toFloat,
          w.toFloat / (w + h), mx.toFloat / 255f))
      }
    }

  /** Format dispatch: real Netpbm decode where the payload parses, stub
    * for everything else (and as the malformed-payload fallback — a bad
    * byte stream must degrade, not kill the partition). */
  private[graft] def decode(format: String, payload: Array[Byte]): Array[Float] =
    if (format == "ppm" || format == "pgm")
      decodeNetpbm(payload).getOrElse(decodeStub(payload))
    else decodeStub(payload)

  /** Feature extraction with per-partition batching (codec init once per
    * partition, then stream). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // [heavier codec init would happen HERE, once per partition]
      records.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length, decode(r.format, r.payload))
      }
    }
  }

  /** Build a real binary-PPM (P6) payload with deterministic LCG pixels —
    * the fixture generator that lets the REAL decode path run end to end
    * on the standard testdata (and in production doubles as a test-card
    * writer). */
  def makePpm(width: Int, height: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](width * height * 3)
    var x = seed
    var i = 0
    while (i < px.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      px(i) = (x >>> 33).toByte
      i += 1
    }
    header ++ px
  }

  /** Real-format twin of [[synthesize]]: every third doc carries an actual
    * P6 raster (pixels seeded by doc_id, metadata matching the embedded
    * header), the rest keep the fake-rgb stand-in — so ONE corpus
    * exercises the real decoder, the stub, and the dispatch between them.
    * Typed map, not a projection: payload GENERATION is fixture plumbing,
    * not a scan path (production payloads arrive in parquet and prune as
    * q77 asserts). */
  def synthesizeMixed(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    synthesize(spark, sfDir).map { r =>
      if (r.doc_id % 3 == 0) {
        val (w, h) = (8 + (r.doc_id % 9).toInt, 8 + (r.doc_id % 7).toInt)
        r.copy(format = "ppm", width = w, height = h,
          payload = makePpm(w, h, r.doc_id))
      } else r
    }
  }

  /** Metadata backfill from the payload itself (the `ffprobe` step of an
    * ingest pipeline): probe each record's header and surface what the
    * BYTES say next to what the catalog claims — mismatches are the
    * corrupt/mislabeled media a curation pass quarantines. mapPartitions,
    * payload never shuffled. */
  def inferMeta(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val hdr = parseNetpbmHeader(r.payload)
        (r.media_id, r.format, hdr.map(_._1).getOrElse("unknown"),
          hdr.map(_._2).getOrElse(-1), hdr.map(_._3).getOrElse(-1), hdr.isDefined)
      }
    }.toDF("media_id", "declared_format", "probed_format",
      "probed_width", "probed_height", "header_ok")
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

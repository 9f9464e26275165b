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
  * per-partition batch shape. The decoder is REAL for two modalities:
  * binary Netpbm images (P6/P5 — header parse + pixel-stats features,
  * `decodeNetpbm`) and RIFF/WAVE PCM audio (container walk + amplitude-
  * stats features, `decodeWav`) — both public, zero-dependency formats
  * decodable in pure JVM code. Formats with no JVM codec here (jpeg,
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

  /** REAL decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)
    * — the third public zero-dependency format. Parses the file header
    * (magic, pixel-data offset) and DIB header (dimensions, planes=1,
    * bpp=24, compression=0; negative height = top-down per the spec) and
    * returns (width, height, topDown, rasterOffset, rowStride) — rows pad
    * to 4-byte boundaries. None when the bytes aren't a well-formed
    * header. */
  private[graft] def parseBmpHeader(
      b: Array[Byte]): Option[(Int, Int, Boolean, Int, Int)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def i32(i: Int): Int = u32(i).toInt
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val off = u32(10)
    val dib = u32(14)
    val w = i32(18)
    val hRaw = i32(22)
    val (h, topDown) = if (hRaw < 0) (-hRaw, true) else (hRaw, false)
    if (dib < 40 || w <= 0 || h <= 0 || u16(26) != 1 ||
      u16(28) != 24 || u32(30) != 0L) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off + stride.toLong * h > b.length) None
    else Some((w, h, topDown, off.toInt, stride))
  }

  /** Decode a BMP payload to the SAME 8-wide pixel-stats feature vector
    * as Netpbm ([mean R, mean G, mean B, luminance stddev, min lum,
    * max lum, aspect, depth/32]) — pixels are stored BGR with padded
    * bottom-up rows, but every emitted statistic is pixel-order-free so
    * the layout differences stay inside the loop. None when the header
    * or raster length is malformed. */
  private[graft] def decodeBmp(payload: Array[Byte]): Option[Array[Float]] =
    parseBmpHeader(payload).map { case (w, h, _, off, stride) =>
      var (sr, sg, sb) = (0.0, 0.0, 0.0)
      var (sl, sl2) = (0.0, 0.0)
      var (mn, mxl) = (1.0, 0.0)
      var row = 0
      while (row < h) {
        var cCol = 0
        while (cCol < w) {
          val p = off + row * stride + cCol * 3
          val (bl, g, r) = (payload(p) & 0xff, payload(p + 1) & 0xff, payload(p + 2) & 0xff)
          val (rf, gf, bf) = (r / 255.0, g / 255.0, bl / 255.0)
          sr += rf; sg += gf; sb += bf
          val lum = 0.299 * rf + 0.587 * gf + 0.114 * bf
          sl += lum; sl2 += lum * lum
          if (lum < mn) mn = lum
          if (lum > mxl) mxl = lum
          cCol += 1
        }
        row += 1
      }
      val nd = w.toDouble * h
      val meanL = sl / nd
      val varL = math.max(0.0, sl2 / nd - meanL * meanL)
      Array(
        (sr / nd).toFloat, (sg / nd).toFloat, (sb / nd).toFloat,
        math.sqrt(varL).toFloat, mn.toFloat, mxl.toFloat,
        w.toFloat / (w + h), 24f / 32f)
    }

  /** REAL decoder for RIFF/WAVE PCM audio — the second public
    * zero-dependency format (images: Netpbm). Parses the RIFF container
    * (little-endian sizes, word-aligned chunks, unknown chunks skipped
    * per the spec) up to the `data` chunk and returns
    * (audioFormat, channels, sampleRate, bitsPerSample, dataOffset,
    * dataLen), or None when the bytes aren't a well-formed container. */
  private[graft] def parseWavHeader(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    while (i + 8 <= b.length) {
      val id = tag(i)
      val sz = u32(i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (id == "fmt " && sz >= 16)
        fmt = Some((u16(i + 8), u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      else if (id == "data")
        return fmt.map { case (af, ch, sr, bps) =>
          (af, ch, sr, bps, i + 8, sz.toInt)
        }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** Decode a PCM WAV payload (8-bit unsigned or 16-bit signed LE, any
    * channel count; frames averaged across channels) to the 8-wide
    * amplitude-stats feature vector:
    * [mean, rms, min, max, zero-crossing rate, duration/10s capped at 1,
    *  channels/8, sampleRate/96000] — amplitudes normalized to [-1,1].
    * None when the container, format, or data length is malformed. */
  private[graft] def decodeWav(payload: Array[Byte]): Option[Array[Float]] =
    parseWavHeader(payload).flatMap { case (af, ch, sr, bps, off, len) =>
      val bytesPer = bps / 8
      if (af != 1 || ch < 1 || sr <= 0 || (bps != 8 && bps != 16)) None
      else {
        val n = len / (bytesPer * ch) // whole frames in the data chunk
        if (n == 0 || off + n.toLong * bytesPer * ch > payload.length) None
        else {
          var (s, s2) = (0.0, 0.0)
          var mn = 1.0
          var mx = -1.0
          var zc = 0L
          var prevNeg = false
          var f = 0
          while (f < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val p = off + (f * ch + c) * bytesPer
              val v =
                if (bps == 8) ((payload(p) & 0xff) - 128) / 128.0
                else ((payload(p) & 0xff) | (payload(p + 1) << 8)).toShort / 32768.0
              acc += v
              c += 1
            }
            val v = acc / ch
            s += v; s2 += v * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            val neg = v < 0
            if (f > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            f += 1
          }
          val nd = n.toDouble
          Some(Array(
            (s / nd).toFloat, math.sqrt(s2 / nd).toFloat, mn.toFloat, mx.toFloat,
            (zc.toDouble / math.max(1.0, nd - 1)).toFloat,
            math.min(1.0, nd / sr / 10.0).toFloat,
            ch / 8f, sr / 96000f))
        }
      }
    }

  /** Format dispatch: real Netpbm/WAV decode where the payload parses,
    * stub for everything else (and as the malformed-payload fallback — a
    * bad byte stream must degrade, not kill the partition). */
  private[graft] def decode(format: String, payload: Array[Byte]): Array[Float] =
    if (format == "ppm" || format == "pgm")
      decodeNetpbm(payload).getOrElse(decodeStub(payload))
    else if (format == "wav")
      decodeWav(payload).getOrElse(decodeStub(payload))
    else if (format == "bmp")
      decodeBmp(payload).getOrElse(decodeStub(payload))
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

  /** Build a real 24-bit bottom-up BMP payload with deterministic LCG
    * pixels — the BMP twin of [[makePpm]]. */
  def makeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * height)
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      p16(i, (v & 0xffff).toInt); p16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    p32(2, out.length.toLong); p32(10, 54)
    p32(14, 40); p32(18, width.toLong); p32(22, height.toLong)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, (stride * height).toLong)
    var x = seed
    var row = 0
    while (row < height) {
      var i = 0
      while (i < width * 3) {
        x = x * 6364136223846793005L + 1442695040888963407L
        out(54 + row * stride + i) = (x >>> 33).toByte
        i += 1
      }
      row += 1
    }
    out
  }

  /** Build a real PCM16-mono WAV payload with deterministic LCG samples —
    * the audio twin of [[makePpm]] (fixture generator; in production a
    * test-tone writer). */
  def makeWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val dataLen = nFrames * 2
    val out = new Array[Byte](44 + dataLen)
    def put(i: Int, s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, i); () }
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      p16(i, (v & 0xffff).toInt); p16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    put(0, "RIFF"); p32(4, 36L + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1); p32(24, sampleRate.toLong)
    p32(28, sampleRate.toLong * 2); p16(32, 2); p16(34, 16)
    put(36, "data"); p32(40, dataLen.toLong)
    var x = seed
    var f = 0
    while (f < nFrames) {
      x = x * 6364136223846793005L + 1442695040888963407L
      p16(44 + 2 * f, ((x >>> 40) & 0xffff).toInt)
      f += 1
    }
    out
  }

  /** Real-format twin of [[synthesize]]: every third doc carries an actual
    * P6 raster, every doc_id ≡ 1 (mod 3) a real PCM16 WAV, every
    * doc_id ≡ 2 (mod 6) a real 24-bit BMP (all seeded by doc_id with
    * metadata matching the embedded header), the rest keep the fake-rgb
    * stand-in — so ONE corpus exercises all three real decoders, the
    * stub, and the dispatch between them. For audio, width carries the
    * frame count and height the channel count (the catalog convention the
    * meta probe checks). Typed map, not a projection: payload GENERATION
    * is fixture plumbing, not a scan path (production payloads arrive in
    * parquet and prune as q77 asserts). */
  def synthesizeMixed(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    synthesize(spark, sfDir).map { r =>
      if (r.doc_id % 3 == 0) {
        val (w, h) = (8 + (r.doc_id % 9).toInt, 8 + (r.doc_id % 7).toInt)
        r.copy(format = "ppm", width = w, height = h,
          payload = makePpm(w, h, r.doc_id))
      } else if (r.doc_id % 3 == 1) {
        val frames = 64 + (r.doc_id % 129).toInt
        r.copy(kind = "audio", format = "wav", width = frames, height = 1,
          payload = makeWav(frames, 8000, r.doc_id))
      } else if (r.doc_id % 6 == 2) {
        val (w, h) = (6 + (r.doc_id % 11).toInt, 6 + (r.doc_id % 5).toInt)
        r.copy(format = "bmp", width = w, height = h,
          payload = makeBmp(w, h, r.doc_id))
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
        // probe image containers first (Netpbm, then BMP), then audio;
        // for WAV the probed (width, height) carry (frames, channels) —
        // the synthesizeMixed catalog convention
        val img = parseNetpbmHeader(r.payload)
          .map(t => (t._1, t._2, t._3))
          .orElse(parseBmpHeader(r.payload).map(t => ("bmp", t._1, t._2)))
        val probe = img.orElse(parseWavHeader(r.payload).map {
          case (_, ch, _, bps, _, len) =>
            ("wav", len / math.max(1, (bps / 8) * ch), ch)
        })
        (r.media_id, r.format, probe.map(_._1).getOrElse("unknown"),
          probe.map(_._2).getOrElse(-1), probe.map(_._3).getOrElse(-1),
          probe.isDefined)
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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal._

/** The multimodal pipeline: binary columns + typed metadata + partition-
  * batched (stubbed) decode. Checks the Spark-side plumbing the stub must
  * preserve: schema, determinism, batch shape, pruning. */
class MultimodalSpec extends AnyFunSuite {
  import SharedSpark.{sf001, spark}

  private lazy val media = Multimodal.synthesize(spark, sf001)

  test("synthesized media has the binary+metadata schema and one row per doc") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(media.count() == Tables.documents(spark, sf001).count())
  }

  test("feature extraction is deterministic, fixed-width, and L1-normalized") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == f2.length && f1.nonEmpty)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq)
      assert(a.features.length == 8)
      assert(math.abs(a.features.sum - 1.0f) < 1e-3)
    }
  }

  test("extraction preserves partitioning (mapPartitions, no shuffle)") {
    val repart = media.repartition(4, col("media_id"))
    val out = Multimodal.extractFeatures(repart)
    assert(out.rdd.getNumPartitions == 4)
  }

  test("resize halves dimensions until under the cap") {
    val out = Multimodal.resize(media, 16).collect()
    out.foreach { r =>
      assert(math.max(r.width, r.height) <= 16)
      assert(r.payload.nonEmpty)
    }
  }

  test("frame sampling keeps every k-th frame only") {
    val frames = Multimodal.sampleFrames(media, 3)
    val idxs = frames.select("frame_idx").distinct()
      .collect().map(_.getInt(0))
    assert(idxs.nonEmpty && idxs.forall(_ % 3 == 0))
  }

  test("metadata-only stats never read the payload column (pruned scan)") {
    val stats = Multimodal.metaStats(media)
    stats.collect() // finalize adaptive plan
    val scan = stats.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scan.contains("payload") && !scan.contains("text"), s"unpruned: $scan")
    assert(stats.count() == 1)
  }

  test("P6/P5 decode is REAL: header fields recovered, features track " +
    "pixel content, comments and gray rasters parse") {
    // round-trip the fixture writer through the parser
    val img = Multimodal.makePpm(9, 7, seed = 42L)
    assert(Multimodal.parseNetpbmHeader(img).map(t => (t._1, t._2, t._3, t._4))
      .contains(("ppm", 9, 7, 255)))
    // features respond to pixel content, not just byte length
    val f1 = Multimodal.decodeNetpbm(Multimodal.makePpm(9, 7, 1L)).get
    val f2 = Multimodal.decodeNetpbm(Multimodal.makePpm(9, 7, 2L)).get
    assert(f1.length == 8 && f1.toSeq != f2.toSeq)
    // a solid-red raster decodes to exactly the stats the pixels dictate
    val red = "P6\n4 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(8)(Array(255.toByte, 0.toByte, 0.toByte)).flatten
    val fr = Multimodal.decodeNetpbm(red).get
    assert(fr(0) == 1f && fr(1) == 0f && fr(2) == 0f, "RGB means wrong")
    assert(fr(3) == 0f && math.abs(fr(4) - 0.299f) < 1e-6 && fr(4) == fr(5),
      "solid image must have zero lum spread")
    // P5 grayscale with a header comment and a sub-255 maxval
    val gray = "P5\n# test card\n3 2 15\n".getBytes("US-ASCII") ++
      Array[Byte](0, 15, 0, 15, 0, 15)
    val fg = Multimodal.decodeNetpbm(gray).get
    assert(math.abs(fg(0) - 0.5f) < 1e-6 && fg(4) == 0f && fg(5) == 1f)
    assert(fg(7) == 15f / 255f)
  }

  test("malformed real-format payloads degrade to the stub, never throw") {
    val garbage = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.decodeNetpbm(garbage).isEmpty)
    assert(Multimodal.decode("ppm", garbage).toSeq ==
      Multimodal.decodeStub(garbage).toSeq)
    // truncated raster: valid header, missing bytes
    val short = "P6\n100 100\n255\nxy".getBytes("US-ASCII")
    assert(Multimodal.decodeNetpbm(short).isEmpty)
    assert(Multimodal.decode("ppm", short).toSeq ==
      Multimodal.decodeStub(short).toSeq)
  }

  test("WAV decode is REAL: container fields recovered, features track " +
    "sample content, 8-bit/multichannel/unknown-chunk payloads parse") {
    // round-trip the fixture writer through the parser
    val wav = Multimodal.makeWav(100, 8000, seed = 42L)
    assert(Multimodal.parseWavHeader(wav)
      .map(t => (t._1, t._2, t._3, t._4, t._6))
      .contains((1, 1, 8000, 16, 200)))
    // features respond to sample content, not just byte length
    val f1 = Multimodal.decodeWav(Multimodal.makeWav(100, 8000, 1L)).get
    val f2 = Multimodal.decodeWav(Multimodal.makeWav(100, 8000, 2L)).get
    assert(f1.length == 8 && f1.toSeq != f2.toSeq)
    // a hand-built 8-bit stereo file with an unknown chunk BEFORE data:
    // frames (128,255)->(0, ~1) and (128,0)->(0, -1) average to ~+0.5/-0.5
    val hdr = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes
    val fmt = "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0) ++
      Array[Byte](1, 0, 2, 0) ++ Array[Byte](0x40, 0x1f, 0, 0) ++ // 8000 Hz
      Array[Byte](0x80.toByte, 0x3e, 0, 0) ++ Array[Byte](2, 0, 8, 0) // align 2, 8 bit
    val junk = "LIST".getBytes ++ Array[Byte](2, 0, 0, 0) ++ Array[Byte](7, 7)
    val data = "data".getBytes ++ Array[Byte](4, 0, 0, 0) ++
      Array[Byte](128.toByte, 255.toByte, 128.toByte, 0)
    val f8 = Multimodal.decodeWav(hdr ++ fmt ++ junk ++ data).get
    assert(math.abs(f8(0) - (0.49609375f - 0.5f) / 2) < 1e-6, "mean wrong")
    assert(f8(2) < 0 && f8(3) > 0 && f8(4) == 1f, "min/max/zcr wrong")
    assert(f8(6) == 2f / 8 && f8(7) == 8000f / 96000)
  }

  test("malformed WAV payloads degrade to the stub, never throw") {
    val garbage = "RIFFnot really a wave file at all.............".getBytes
    assert(Multimodal.decodeWav(garbage).isEmpty)
    assert(Multimodal.decode("wav", garbage).toSeq ==
      Multimodal.decodeStub(garbage).toSeq)
    // truncated data chunk: declared length overruns the payload
    val t = Multimodal.makeWav(10, 8000, 1L).dropRight(5)
    assert(Multimodal.decodeWav(t).isEmpty)
    assert(Multimodal.decode("wav", t).toSeq == Multimodal.decodeStub(t).toSeq)
  }

  test("BMP decode is REAL: header fields recovered, features track pixel " +
    "content, row padding is skipped") {
    val bmp = Multimodal.makeBmp(7, 5, seed = 42L) // stride 24 > 21: padded rows
    assert(Multimodal.parseBmpHeader(bmp).contains((7, 5, false, 54, 24)))
    val f1 = Multimodal.decodeBmp(Multimodal.makeBmp(7, 5, 1L)).get
    val f2 = Multimodal.decodeBmp(Multimodal.makeBmp(7, 5, 2L)).get
    assert(f1.length == 8 && f1.toSeq != f2.toSeq)
    // hand-built 1×1 white-pixel BMP with GARBAGE padding bytes: stats see
    // only the pixel (mean 1, stddev 0) — padding must be skipped
    val one = Multimodal.makeBmp(1, 1, 0L)
    one(54) = 0xff.toByte; one(55) = 0xff.toByte; one(56) = 0xff.toByte
    one(57) = 0x13.toByte // padding byte: junk on purpose
    val fw = Multimodal.decodeBmp(one).get
    assert(fw(0) == 1f && fw(1) == 1f && fw(2) == 1f && fw(3) == 0f &&
      fw(4) == 1f && fw(5) == 1f, s"white-pixel stats wrong: ${fw.toSeq}")
  }

  test("malformed BMP payloads degrade to the stub, never throw") {
    val garbage = "BMnot a bitmap at all...........................................".getBytes
    assert(Multimodal.decodeBmp(garbage).isEmpty)
    assert(Multimodal.decode("bmp", garbage).toSeq ==
      Multimodal.decodeStub(garbage).toSeq)
    // truncated raster: header fine, pixel rows overrun the payload
    val t = Multimodal.makeBmp(9, 9, 1L).dropRight(10)
    assert(Multimodal.decodeBmp(t).isEmpty)
    assert(Multimodal.decode("bmp", t).toSeq == Multimodal.decodeStub(t).toSeq)
  }

  test("mixed corpus end-to-end: ppm, wav, and bmp rows decode for real, " +
    "others stub, and the metadata probe surfaces the embedded headers") {
    val mixed = Multimodal.synthesizeMixed(spark, sf001)
    val feats = Multimodal.extractFeatures(mixed).collect()
      .map(f => f.media_id -> f).toMap
    val recs = mixed.collect()
    assert(recs.exists(_.format == "ppm") && recs.exists(_.format == "wav") &&
      recs.exists(_.format == "bmp") && recs.exists(_.format == "fake-rgb"))
    recs.foreach { r =>
      val expected = r.format match {
        case "ppm" => Multimodal.decodeNetpbm(r.payload).get
        case "wav" => Multimodal.decodeWav(r.payload).get
        case "bmp" => Multimodal.decodeBmp(r.payload).get
        case _     => Multimodal.decodeStub(r.payload)
      }
      assert(feats(r.media_id).features.toSeq == expected.toSeq,
        s"media ${r.media_id} (${r.format}) took the wrong decode path")
    }
    // the probe reads the BYTES: ppm/bmp/wav rows surface their embedded
    // headers (matching the catalog metadata: for wav, width=frames,
    // height=channels), fake rows are flagged unparseable
    val probed = Multimodal.inferMeta(mixed).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getInt(3), r.getInt(4),
        r.getBoolean(5)))).toMap
    recs.foreach { r =>
      val (pf, pw, ph, ok) = probed(r.media_id)
      if (r.format == "ppm" || r.format == "wav" || r.format == "bmp")
        assert(ok && pf == r.format && pw == r.width && ph == r.height,
          s"media ${r.media_id}: probed ($pf,$pw,$ph) != declared " +
            s"(${r.format},${r.width},${r.height})")
      else assert(!ok && pf == "unknown")
    }
  }

  test("q77 media metadata query prunes the scan to n_chars (no text/payload)") {
    // The declared, oracle-gated metadata aggregation must behave like a
    // catalog scan: column pruning pushes through synthesize's projection
    // and the parquet read touches ONLY the metadata source column.
    val df = SparkEntry.queries("q77_media_meta")(spark, sf001)
    df.collect() // finalize adaptive plan
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("n_chars"), s"expected n_chars-only scan: $scan")
    assert(!scan.contains("text") && !scan.contains("payload"), s"unpruned: $scan")
  }
}

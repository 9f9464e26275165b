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

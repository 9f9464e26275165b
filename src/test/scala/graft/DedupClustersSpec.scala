package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

class DedupClustersSpec extends AnyFunSuite {
  import SharedSpark.{sf001, spark}
  import spark.implicits._

  test("connected components labels known clusters correctly") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle via 2 edges)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("pointer jumping: a 64-node path converges within 8 iterations") {
    // pure edge-propagation needs 63 rounds on this graph; the
    // label-of-label shortcut must get there in O(log n) — maxIter = 8
    // makes the spec FAIL (non-convergence throw) if the shortcut breaks
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.dupClusters(pairs, maxIter = 8).as[(Long, Long)].collect().toMap
    assert(labels.size == 64 && labels.values.forall(_ == 0L))
  }

  test("every near-dup pair from q46 lands in one cluster; dedup keeps min ids") {
    val pairs = SparkEntry.queries("q46_minhash_lsh")(spark, sf001)
      .select("doc_a", "doc_b")
    if (pairs.isEmpty) cancel("no near-dup pairs at this SF")
    val labels = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
      assert(labels(a) <= math.min(a, b))
    }

    val docs = Tables.documents(spark, sf001)
    val kept = Dedup.dedupByCluster(docs, pairs)
    val expectedRemoved = labels.count { case (n, l) => n != l }
    assert(docs.count() - kept.count() == expectedRemoved)
    // canonical docs (cluster labels) survive
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    labels.values.toSet.foreach((l: Long) => assert(keptIds.contains(l)))
  }

  test("declared pair producers emit DISTINCT pairs (the dupClusters " +
    "contract is checkable, not just a comment)") {
    // dupClusters deliberately does NOT re-distinct its input (the edge
    // distinct would add a shuffle per call on the q78 hot path); the
    // contract is that every producer ends in a distinct/groupBy. Lock the
    // producers that actually feed it:
    //  - minhashLshPairs (q78 / TrainingDataPipeline / q46's base) — the
    //    one whose terminal distinct was restructured in round 8;
    //  - q66's lag-consecutive chain is distinct by construction (doc_b is
    //    the unique current row id), asserted via the declared query's
    //    unique node set instead.
    val lsh = graft.ops.LlmExt2.minhashLshPairs(
      Tables.documents(spark, sf001)
        .select(col("doc_id"), col("lang"), col("text")),
      threshold = 0.6, materialize = true, portableIds = true)
      .select("doc_a", "doc_b")
    val n = lsh.count()
    assert(n == lsh.distinct().count(),
      "minhashLshPairs emitted duplicate edges — dupClusters' no-re-distinct " +
        "contract is violated; restore a terminal distinct/groupBy")
    val q66 = SparkEntry.queries("q66_dup_clusters")(spark, sf001)
    assert(q66.count() == q66.select("doc_id").distinct().count())
  }

  test("min-neighbor seed: a clique converges with ZERO rounds (maxIter = 0)") {
    // The seed labels every star/clique member with the component min
    // BEFORE round 1 and the edge-consistency check observes it on the
    // seed itself, so NO propagation round runs at all — maxIter = 0
    // would throw if either the seed or the seed-level check broke.
    // Locks the zero-round win on the common near-dup cluster shape
    // (r15 and earlier paid one full confirming round here).
    val clique = Seq((5L, 6L), (5L, 7L), (6L, 7L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.dupClusters(clique, maxIter = 0).as[(Long, Long)].collect().toMap
    assert(labels == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 20L -> 20L, 21L -> 20L))
  }
}

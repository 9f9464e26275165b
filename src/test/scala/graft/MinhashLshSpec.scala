package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmExt2

/** Direct tests for the PRODUCTION MinHash+LSH path (`minhashLshPairs`) —
  * the operator the curation pipeline depends on (round-2 VERDICT: it was
  * only exercised transitively through PipelineSpec).
  *
  * Locked here:
  *  1. precision: every emitted pair carries the EXACT Jaccard (verified
  *     against an independent all-pairs computation) — output ⊆ exact pairs;
  *  2. recall: identical docs (jaccard = 1) are ALWAYS found (equal token
  *     sets ⇒ equal signatures in every band), and corpus-wide recall vs
  *     the exact >= threshold pairs is deterministic on fixed data;
  *  3. plan shape: the full lineage (materialize = false) contains no
  *     Window operator and no single-partition exchange — the whole point
  *     of the xxhash64-id variant vs the oracle tokenDict form;
  *  4. degenerate skew: an all-identical corpus (THE hot-band failure mode
  *     SCALE.md §3 names) completes with exactly C(n,2) verified pairs.
  */
class MinhashLshSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  /** Independent exact same-lang Jaccard >= minJ pairs over (doc_id, lang,
    * text) docs — token-inverted-index join, no minhash involved. */
  private def exactPairs(docs: DataFrame, minJ: Double): DataFrame = {
    val toks = docs.select(
      col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard", col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .where(col("jaccard") >= minJ)
      .select("doc_a", "doc_b", "jaccard")
  }

  test("precision: emitted pairs exactly match independent Jaccard; recall on identical docs is total") {
    val docs = Tables.documents(spark, sf01)
    val got = LlmExt2.minhashLshPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = exactPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty, "vacuous: no near-dup pairs found at 0.5 on sf0.01")
    // output ⊆ exact, with bit-identical jaccard values (the verify stage
    // recomputes exact Jaccard on candidates — any mismatch is a bug)
    got.foreach { case (k, j) =>
      assert(exact.contains(k), s"pair $k emitted but not exactly >= 0.5")
      assert(exact(k) == j, s"pair $k jaccard ${exact(k)} != emitted $j")
    }
    // guaranteed recall: identical token sets share every band signature
    val identical = exact.filter(_._2 == 1.0).keySet
    val missedIdentical = identical -- got.keySet
    assert(missedIdentical.isEmpty, s"identical docs missed: $missedIdentical")
    // deterministic corpus-wide recall (fixed data + fixed hash family):
    // report and bound it so a refactor that quietly degrades candidate
    // generation fails loudly. The 4×4 banding S-curve is centered at
    // (1/4)^(1/4) ≈ 0.71, and THIS corpus's baseline same-lang Jaccard is
    // ~0.5 (CLAUDE.md: 31-token vocab) — so nearly every same-lang pair
    // clears 0.5 and recall there is probabilistic by design; the near-dup
    // regime (J >= 0.8) is where LSH must not miss.
    def recallAt(minJ: Double): Double = {
      val want = exact.filter(_._2 >= minJ).keySet
      val found = want.count(got.contains).toDouble / want.size
      info(f"recall at J>=$minJ%.1f: ${want.count(got.contains)}/${want.size} = $found%.3f")
      found
    }
    assert(recallAt(0.5) >= 0.70, "below-curve recall regressed")
    assert(recallAt(0.8) >= 0.95, "near-dup recall regressed")
  }

  test("plan shape: no Window and no single-partition exchange in the full lineage") {
    val docs = Tables.documents(spark, sf01)
    val plan = LlmExt2.minhashLshPairs(docs, threshold = 0.5, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "production LSH path must not contain a Window")
    assert(!plan.contains("SinglePartition"),
      "production LSH path must not funnel through a single-partition exchange")
  }

  test("distributed tokenDict == global dense_rank ids; no vocab-scale global sort") {
    // round 4: the oracle-family dictionary (q46/q47/q51/q56) dropped its
    // single-partition dense_rank for a bucketed rank + tiny prefix-sum.
    // (a) ids must stay bit-identical to the single-window form — that is
    // what keeps the DuckDB oracles valid; exercised on a synthetic vocab
    // (multi-char buckets, empty-string token, unicode) plus real sf0.1
    // tokens.
    val syn = spark.createDataFrame(
      Seq("", "a", "aa", "ab", "b", "ba", "zz", "é", "êx", "Z0", "09", "  x")
        .map(Tuple1(_))).toDF("tok")
    val real = Tables.documents(spark, sf01).select(
      explode(split(col("text"), " ")).as("tok"))
    for (toks <- Seq(syn, real)) {
      val got = LlmExt2.tokenDict(toks)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val want = toks.select("tok").distinct()
        .withColumn("tid", dense_rank().over(
          org.apache.spark.sql.expressions.Window.orderBy("tok")))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got.nonEmpty && got == want)
    }
    // (b) plan shape: every unpartitioned window sits above an Aggregate
    // (the per-bucket count frame, ≤ |alphabet| rows) — never over the
    // token-scale distinct
    val plan = LlmExt2.tokenDict(real).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
    val globals = windows.filter(_.partitionSpec.isEmpty)
    assert(globals.nonEmpty, "the offset prefix window should exist")
    globals.foreach { w =>
      assert(w.child.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
        "an unpartitioned Window reads the token-scale frame")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty))
  }

  test("degenerate skew: all-identical corpus completes with exactly C(n,2) pairs at jaccard 1") {
    val n = 200
    val dup = spark.range(n).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
    val out = LlmExt2.minhashLshPairs(dup, threshold = 0.9).cache()
    try {
      assert(out.count() == n.toLong * (n - 1) / 2)
      assert(out.where(col("jaccard") =!= 1.0).count() == 0)
      assert(out.where(col("doc_a") >= col("doc_b")).count() == 0)
    } finally out.unpersist()
  }
}

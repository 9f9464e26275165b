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
    // Re-anchored round 15 with the final 69621-power family: measured
    // 0.598 at J>=0.5 and 0.913 at J>=0.8 on sf0.01. The old 0.70/0.95+
    // were inflated by the weak-mixing (4i+3) family's over-dense
    // candidates, and the intermediate 48271·(i+1) family's 0.675/0.948
    // still carried shared-factor argmin correlation (extra candidates,
    // extra verify cost — see minhashArr's family note); the honest 4×4
    // S-curve collides at 1-(1-s^4)^4 = 0.878 at s=0.8 and 0.986 at
    // s=0.9, so ~0.91 over the J∈[0.8,1] mix is the family working as
    // designed, and ~0.6 over the everything-above-baseline J>=0.5 mix
    // is the curve's below-knee region doing what the S-curve says.
    // q252 is the declared knob for trading candidate volume against
    // this recall.
    assert(recallAt(0.5) >= 0.55, "below-curve recall regressed")
    assert(recallAt(0.8) >= 0.90, "near-dup recall regressed")
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

  test("hash family wraps: per-doc argmin diversity > 1 on dictionary ids (q46 degeneracy gate)") {
    // Round-15 regression gate for the q252-measured degeneracy: the
    // original (4i+3) multipliers (≤ 63) never wrapped P on the gate
    // corpus's dictionary-ranked tids (vocab 31), so min((4i+3)·tid+c_i)
    // = (4i+3)·min(tid)+c_i for every i — all 16 "independent" minhashes
    // picked the same argmin token and LSH banding emitted 74% of carve
    // all-pairs at sf0.01 regardless of the band configuration. The
    // production family must keep PERMUTING: across the 16 hashes each
    // doc's argmin tokens must not collapse to one.
    val P = 104729L
    val toks = Tables.documents(spark, sf01)
      .where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    val tokIds = toks.join(LlmExt2.tokenDict(toks), "tok")
      .groupBy("doc_id")
      .agg(collect_list(col("tid").cast("long")).as("ids"))
    val rows = tokIds.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
    assert(rows.nonEmpty)
    def argmins(ids: Vector[Long], mult: Int => Long): Vector[Long] =
      (0 until 16).map(i => ids.minBy(id => (mult(i) * id + 7L * i + 5) % P)).toVector
    // production family: genuinely distinct permutations per i
    val divNew = rows.map { case (_, ids) => argmins(ids, i => ops.LlmExt2.mhMults(i)).distinct.size }
    val avgNew = divNew.sum.toDouble / divNew.size
    info(f"production family: avg distinct argmins/doc = $avgNew%.2f (max ${divNew.max})")
    assert(divNew.max > 1, "every doc's 16 minhashes picked ONE argmin — family degenerate")
    assert(avgNew > 1.5, f"argmin diversity collapsed ($avgNew%.2f) — family near-degenerate")
    // the legacy family IS degenerate on these tids (documents why it was
    // replaced); guard on the non-wrapping precondition max(tid)·63 < P
    val legacy = rows.filter(_._2.max * 63 < P)
      .map { case (_, ids) => argmins(ids, i => 4L * i + 3).distinct.size }
    assert(legacy.nonEmpty && legacy.forall(_ == 1),
      "expected the legacy (4i+3) family to be argmin-degenerate on small tids")
    // and the JVM replay above is the SAME math minhashArr runs: lock the
    // Spark-side minhash array bit-for-bit against the plain-Scala fold
    val sparkMh = tokIds.withColumn("mh", LlmExt2.minhashArr(col("ids")))
      .select("doc_id", "mh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val jvmMh = rows.toMap.map { case (d, ids) =>
      d -> (0 until 16).map(i => ids.map(id => (ops.LlmExt2.mhMults(i) * id + 7L * i + 5) % P).min).toVector
    }
    assert(sparkMh == jvmMh)
  }

  test("hash family independence: no small multiplicative relation between multipliers") {
    // The round-15 lesson in structural form: argmin correlation between
    // affine hashes h_i, h_j appears whenever c·m_i ≡ ±d·m_j (mod P) for
    // SMALL c, d — then d·h_j ≡ ±c·h_i + const over the whole id space,
    // both sides stay piecewise-monotone in the same y, and the two
    // minima track each other (band agreement then runs far above the
    // S-curve: 296× candidate inflation measured at 320k docs, SCALE.md
    // §15). Both historical families fail this gate: the original (4i+3)
    // has 5·m_0 = m_3 (c+d = 6, an integer identity below P), and the
    // round-15 interim 48271·(i+1) has 2·m_0 = m_1 (c+d = 3 — every pair
    // related through the shared factor). The production power family's
    // smallest relation within c, d ≤ 64 is c+d = 67, so the ≤ 10 gate
    // below passes with a wide margin. Argmin DIVERSITY (the test above)
    // cannot catch this class: the interim family passed it while
    // correlated ACROSS hashes.
    val P = 104729L
    val ms = ops.LlmExt2.mhMults
    assert(ms.size == 16 && ms.distinct.size == 16)
    for {
      i <- ms.indices; j <- (i + 1) until ms.size
      c <- 1 to 10; d <- 1 to 10
    } {
      assert((c * ms(i) - d * ms(j)) % P != 0 && (c * ms(i) + d * ms(j)) % P != 0,
        s"m_$i and m_$j are small-rationally related: $c*m_$i == ±$d*m_$j (mod P)")
    }
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

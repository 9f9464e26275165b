package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev measurement harness (VERDICT r9 task #5): MEASURE — don't just
  * argue — the scaling curves of the five bucketed dedup/similarity
  * pipelines, on corpora synthesized through the deterministic id
  * arithmetic of the `graft-gen` DSv2 source (no new testdata needed).
  *
  * Two vocabulary regimes, because candidate volume is a DATA property:
  *  - `real`: two-tier Zipf-ish draw (80% from 2048 hot tokens, 20% from
  *    65536 cold) — the sparse-similarity regime every LSH paper assumes.
  *    (A first cut used a 50-token hot core carrying 80% of the mass:
  *    every doc then contains the few lowest-hashing hot tokens, minhash
  *    signatures go nearly constant, and LSH degenerates to Θ(n²)
  *    candidates — 63 s at 50k docs, >66 GB of spill at 250k. Signature
  *    diversity needs VOCABULARY diversity; that run is kept in SCALE.md
  *    §11 as the measured failure mode.);
  *  - `adv`: the testdata's adversarial 31-token density (baseline
  *    Jaccard ~0.5), where near-EVERY same-lang pair collides and any
  *    candidate generator's output is Θ(n²) BY CONSTRUCTION — the plans
  *    stay equi-join-shaped, but no plan can beat the output size.
  *
  * Every 10th doc duplicates its block's first doc, so dedup finds real
  * clusters at every size. Usage:
  *   runMain graft.ScaleCurve [regime] [sizes,csv]
  * defaults: real 5000,50000,250000 (adv caps at 20000 — see above).
  * Results → SCALE.md §11 (round-10 table).
  */
object ScaleCurve {

  /** Deterministic synthetic documents over the graft-gen source: id →
    * (doc_id, lang, text); text tokens drawn by pure hash arithmetic so
    * any size regenerates bit-identically. */
  def docs(spark: SparkSession, n: Long, regime: String): DataFrame = {
    val base = spark.read.format("graft-gen")
      .option("rows", n.toString).option("partitions", "32").load()
      // every 10th doc is a VERBATIM duplicate of its block's first doc
      // (seed drives both the token stream and the length)
      .select(col("id").as("doc_id"),
        when(col("id") % 10 === 9, col("id") - 9).otherwise(col("id")).as("seed"))
      // lang/len re-derived from seed so the duplicate lands in the SAME
      // lang block as its original (every pipeline blocks by lang)
      .withColumn("lang", element_at(
        array(graft.sources.GraftGen.langs.map(lit).toIndexedSeq: _*),
        (pmod(col("seed"), lit(5)) + 1).cast("int")))
      .withColumn("len", lit(20L) + (col("seed") * 37L) % 100L)
    val tok =
      if (regime == "adv")
        (h: org.apache.spark.sql.Column) => concat(lit("t"), pmod(h, lit(31)))
      else {
        // `heaps`: the cold vocabulary grows with the corpus (Heaps' law —
        // real vocabularies grow ~n^0.5-0.8), keeping per-token document
        // frequency flat; `real` holds it FIXED at 65536, so candidate
        // volume for token-bucketed joins grows Θ(n²/V) by construction.
        val cold = if (regime == "heaps") math.max(65536L, n * 13) else 65536L
        (h: org.apache.spark.sql.Column) =>
          when(pmod(h, lit(10)) < 8, concat(lit("h"), pmod(h, lit(2048))))
            .otherwise(concat(lit("c"), pmod(h, lit(cold))))
      }
    base.select(col("doc_id"), col("lang"),
      array_join(transform(sequence(lit(1), col("len")),
        p => tok(xxhash64(col("seed") * 1315423911L + p.cast("long")))), " ").as("text"))
  }

  private val P = 104729L

  /** q56's production shape, unsampled, at the WIDTH a corpus this size
    * needs: 48-bit fingerprints in 4×12-bit pieces (same hamming ≤ 3
    * pigeonhole guarantee). q56's 16-bit width is the oracle-tied
    * test-scale constant; fingerprint width is the standard SimHash
    * resolution knob and must grow with corpus similarity mass. */
  private def simhashBlocked(d: DataFrame): DataFrame = {
    val bits = 48
    val tf = d
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("tid", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % P)
    val sums = (0 until bits).map { j =>
      sum(col("cnt") * (lit(2) * (((col("tid") * (2 * j + 3) + (7 * j + 1)) % P) % 2) - 1)).as(s"s$j")
    }
    val sims = tf.groupBy("doc_id", "lang").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), col("lang"),
        (0 until bits).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .localCheckpoint()
    val pieces = sims.select(col("doc_id"), col("lang"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        p => floor(col("simhash") / pow(lit(2.0), p.cast("double") * 12)).cast("long") % 4096)))
      .withColumnsRenamed(Map("pos" -> "piece_idx", "col" -> "piece"))
    pieces.repartition(32).as("x")
      .join(pieces.as("y"), col("x.lang") === col("y.lang") &&
        col("x.piece_idx") === col("y.piece_idx") && col("x.piece") === col("y.piece") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
  }

  /** q75's production shape: hashed-id band signatures; 1/5 delta probes
    * 4/5 history; exact verify on the hashed-id arrays. */
  private def incremental(d: DataFrame): DataFrame = {
    val withIds = d.select(col("doc_id"), col("lang"),
      transform(array_distinct(split(col("text"), " ")),
        t => pmod(xxhash64(t), lit(P))).as("ids"))
      .localCheckpoint()
    val sig = graft.ops.LlmExt2.explodeBandSigs(withIds)
    val hist = sig.where(col("doc_id") % 5 =!= 0)
    val delta = sig.where(col("doc_id") % 5 === 0)
    val cand = delta.as("n")
      .join(hist.as("h"), col("n.band") === col("h.band") &&
        col("n.sig") === col("h.sig") && col("n.lang") === col("h.lang"))
      .select(col("n.doc_id").as("new_id"), col("h.doc_id").as("hist_id"))
      .distinct()
      .repartition(32)
    val arrs = withIds.select(col("doc_id"), col("ids"))
    cand
      .join(arrs.select(col("doc_id").as("new_id"), col("ids").as("ia")), "new_id")
      .join(arrs.select(col("doc_id").as("hist_id"), col("ids").as("ib")), "hist_id")
      .withColumn("nc", size(array_intersect(col("ia"), col("ib"))).cast("long"))
      .withColumn("j", col("nc") / (size(col("ia")) + size(col("ib")) - col("nc")))
      .where(col("j") >= 0.6)
      .select("new_id", "hist_id")
  }

  /** q101's production shape, uncarved: the shared PPJoin+ stack
    * (rarest-first prefix + length + positional filters) at 0.9. */
  private def prefixFilter(d: DataFrame): DataFrame =
    graft.ops.Mining.ppjoinPairs(d).select("doc_a", "doc_b")

  /** q137's shape at block prefix width `w` — `snm_w8` measures the
    * DECLARED test-scale constant as-is to show where it stops scaling;
    * `snm_derived` runs the production width derivation first. */
  private def snmAt(d: DataFrame, width: Int): DataFrame = {
    val t = d.select(col("doc_id"), col("lang"), col("text"),
      substring(col("text"), 1, width).as("blk"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val win = Window.partitionBy("lang", "blk").orderBy("text", "doc_id")
    val w = t.select(col("lang"), col("doc_id"), col("toks"),
      lead("doc_id", 1).over(win).as("id1"), lead("toks", 1).over(win).as("tk1"),
      lead("doc_id", 2).over(win).as("id2"), lead("toks", 2).over(win).as("tk2"))
    val p = w.where(col("id1").isNotNull)
      .select(col("doc_id").as("doc_a"), col("id1").as("doc_b"),
        col("toks").as("ta"), col("tk1").as("tb"))
      .unionAll(w.where(col("id2").isNotNull)
        .select(col("doc_id").as("doc_a"), col("id2").as("doc_b"),
          col("toks").as("ta"), col("tk2").as("tb")))
    p.withColumn("nc", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("j", col("nc") / (size(col("ta")) + size(col("tb")) - col("nc")))
      .where(col("j") >= 0.6)
      .select("doc_a", "doc_b")
  }

  /** q137's PRODUCTION width derivation (the constant `8` is the declared
    * query's oracle-tied test-scale pin — Round9b.scala documents it):
    * widen the block prefix in steps of 4 chars until the p99 block size
    * is bounded. Each candidate width costs one count-rollup + a 1-row
    * percentile — O(scan) per probe, a handful of probes — and the
    * resulting block population is what keeps the per-block sort (SNM's
    * only super-linear term) a constant-size task at any corpus size. */
  private def derivedWidth(d: DataFrame, bound: Long = 64L): Int =
    Iterator.iterate(8)(_ + 4).take(15).find { w =>
      d.groupBy(col("lang"), substring(col("text"), 1, w))
        .count()
        .agg(expr("percentile_approx(count, 0.99, 10000)"))
        .head().getLong(0) <= bound
    }.getOrElse(64)

  private def snmDerived(d: DataFrame): DataFrame = {
    val w = derivedWidth(d)
    println(s"    [snm_derived] width=$w")
    snmAt(d, w)
  }

  /** Recall audit for the derived width: pair overlap of the derived-width
    * run against the declared w=8 run at each size (`regime snmrecall`).
    * SNM recall is window-placement-dependent, so widening blocks MOVES
    * sort neighborhoods; the audit measures what that costs. */
  private def snmRecall(spark: SparkSession, sizes: Seq[Long], regime: String): Unit = {
    println(f"${"n_docs"}%8s ${"width"}%6s ${"pairs_w8"}%10s ${"pairs_wd"}%10s ${"overlap"}%10s ${"recall_vs_w8"}%13s ${"planted_w8"}%10s ${"planted_wd"}%10s")
    for (n <- sizes) {
      val d = docs(spark, n, regime).localCheckpoint()
      val w8 = snmAt(d, 8).localCheckpoint()
      val w = derivedWidth(d)
      val wd = snmAt(d, w).localCheckpoint()
      val (nW8, nWd) = (w8.count(), wd.count())
      val overlap = w8.intersect(wd).count()
      // recall on the PLANTED verbatim duplicates (doc 10k+9 copies 10k) —
      // the dedup-relevant metric: identical texts share any prefix and
      // sort adjacent, so block splits should never lose them
      val planted = spark.range(0, (n + 9) / 10)
        .select((col("id") * 10).as("a"), (col("id") * 10 + 9).as("b"))
        .where(col("b") < n)
      def plantedRecall(p: DataFrame): Double = {
        val norm = p.select(least(col("doc_a"), col("doc_b")).as("a"),
          greatest(col("doc_a"), col("doc_b")).as("b"))
        // sizes below the planted-pair stride have 0 planted pairs — report
        // recall 0 rather than NaN (ADVICE round 11)
        norm.join(planted, Seq("a", "b")).count().toDouble /
          math.max(planted.count(), 1L)
      }
      println(f"$n%8d $w%6d $nW8%10d $nWd%10d $overlap%10d ${overlap.toDouble / math.max(nW8, 1L)}%13.3f ${plantedRecall(w8)}%10.3f ${plantedRecall(wd)}%10.3f")
    }
  }

  /** kcore regime (round 12, VERDICT #4): measure q225's edge-build growth
    * with and without the 16-users-per-cell cap on a synthetic event
    * stream whose cell density grows linearly with volume (the premise of
    * the round-11 weak-item: users scale with events, the (hour, type)
    * cell grid is fixed, so uncapped pair volume is Θ(cell²)·cells —
    * quadratic in corpus size — while the capped build is ≤ C(16,2)·cells,
    * flat). Uncapped only runs to 300k events (3.3e9 pairs at 1M is the
    * point, not a number worth computing). */
  private def kcoreCurve(spark: SparkSession, sizes: Seq[Long]): Unit = {
    println(f"${"variant"}%-10s ${"n_events"}%9s ${"n_cells"}%8s ${"edges"}%12s ${"sec"}%8s")
    for (n <- sizes) {
      val ev = spark.read.format("graft-gen")
        .option("rows", n.toString).option("partitions", "32").load()
        .select((col("id") % lit(math.max(n / 50, 1L))).as("user_id"),
          pmod(xxhash64(col("id") * 7919L), lit(24L)).as("hb"),
          concat(lit("t"), pmod(xxhash64(col("id") * 104729L), lit(4L))).as("event_type"))
        .distinct()
        .localCheckpoint()
      def edges(e: DataFrame): DataFrame = e.as("a").join(e.as("b"),
          col("a.hb") === col("b.hb") &&
            col("a.event_type") === col("b.event_type") &&
            col("a.user_id") < col("b.user_id"))
        .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
        .distinct()
      // q225's exact cap: portable md5 rank within the cell, ≤16 survive
      val capped = ev.withColumn("rk", row_number().over(
          Window.partitionBy("hb", "event_type").orderBy(
            md5(concat_ws("#", col("user_id"), col("hb"), col("event_type"))),
            col("user_id"))))
        .where(col("rk") <= 16).drop("rk")
      val nCells = ev.select("hb", "event_type").distinct().count()
      val variants = Seq("capped16" -> capped) ++
        (if (n <= 300000) Seq("uncapped" -> ev) else Nil)
      for ((nm, d) <- variants) {
        val t0 = System.nanoTime()
        val cnt = edges(d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$nm%-10s $n%9d $nCells%8d $cnt%12d $dt%8.2f")
      }
    }
  }

  /** Deterministic synthetic vectors: id → 64 hash-arithmetic dims in
    * [-1, 1], any size regenerates bit-identically. */
  private def vecs(spark: SparkSession, n: Long): DataFrame =
    spark.read.format("graft-gen")
      .option("rows", n.toString).option("partitions", "32").load()
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          k => (pmod(xxhash64(col("id") * lit(2654435761L) + k.cast("long")),
            lit(2001L)) - 1000L).cast("double") / 1000.0).as("embedding"))

  /** Planted-cluster corpus (round-14 verdict task #3): vector = cluster
    * center + 0.25·noise, both drawn by the same deterministic hash
    * arithmetic as [[vecs]]. Cluster COUNT grows with N (population
    * pinned ~500 — the same policy the knngraph/semdedup regimes pin
    * nlist by), so the geometry scales the way the routing assumes.
    * Separation is moderate, not toy: expected inter-center d² ≈ 64·2/3
    * ≈ 43 vs within-cluster d² ≈ 64·2·0.25²/3 ≈ 2.7 (≈4× in distance) —
    * real embedding clusters overlap more than a synthetic grid but far
    * less than the isotropic corpus (which has NO structure to capture:
    * max cos 0.46). */
  private def clusteredVecs(spark: SparkSession, n: Long): DataFrame = {
    val ncl = math.max(8L, n / 500)
    spark.read.format("graft-gen")
      .option("rows", n.toString).option("partitions", "32").load()
      .withColumn("g", pmod(xxhash64(col("id")), lit(ncl)))
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), k =>
          (pmod(xxhash64(col("g") * lit(2654435761L) + k.cast("long")),
            lit(2001L)) - 1000L).cast("double") / 1000.0
          + lit(0.25) *
            (pmod(xxhash64(col("id") * lit(3266489917L) + k.cast("long")
              + lit(1000000007L)), lit(2001L)) - 1000L).cast("double") / 1000.0)
          .as("embedding"))
  }

  /** semdedup regime (round 12): q231's scale posture measured. The claim
    * is that within-cluster pairwise comparison is LINEAR in N once
    * cluster populations are pinned (~500 here) by growing the cluster
    * count with N — vs the all-pairs quadratic. Two cluster-key shapes:
    *  - `semdedup_kmeans` (q231's declared shape): frozen seed centroids,
    *    integer-grid argmin assignment. The PAIRWISE stage is linear, but
    *    the ASSIGN stage is Θ(N·nlist) = Θ(N²/target) when nlist grows
    *    with N — the curve exposes that bend honestly (production runs
    *    the assign as sampled-trained blocked BLAS, or picks the next
    *    shape).
    *  - `semdedup_signbucket`: cluster key = the first ⌈log2(N/500)⌉
    *    SIGN bits of the vector (the q232 binary-code trick as a
    *    bucketer) — assignment is ONE projection, Θ(N) total; the
    *    measured near-linear scale path.
    * Both plant 1/17 coarser-grid twins (q231's plant) and report planted
    * recall — a curve that loses its planted pairs is pruning wrongly. */
  private def semdedupCurve(spark: SparkSession, sizes: Seq[Long]): Unit = {
    import graft.plans.DotProduct.{dot => dotC, norm2 => n2C}
    println(f"${"pipeline"}%-20s ${"n_vecs"}%8s ${"cells"}%6s ${"sec"}%8s ${"pairs"}%12s ${"recall"}%7s")
    for (n <- sizes) {
      val qv = graft.ops.Round11.quantized(
        vecs(spark, n).select(col("vec_id"), col("embedding")))
      val twins = qv.where(col("vec_id") % 17 === 5)
        .select((col("vec_id") + lit(100000000L)).as("vec_id"),
          expr("transform(v, x -> x - x % 1000)").as("v"))
      val all = qv.unionAll(twins).localCheckpoint()
      val nPlanted = all.where(col("vec_id") >= 100000000L).count()

      def pairwise(nm: String, cells: Int, assigned: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val wn = assigned
          .select(col("vec_id"), col("cell"), col("v").cast("array<double>").as("vd"))
          .withColumn("n2", n2C(col("vd")))
        val a = wn.select(col("vec_id").as("id_a"), col("cell"),
          col("vd").as("va"), col("n2").as("na"))
        val b = wn.select(col("vec_id").as("id_b"), col("cell"),
          col("vd").as("vb"), col("n2").as("nb"))
        val r = a.join(b, Seq("cell")).where(col("id_a") < col("id_b"))
          .withColumn("cos_sim", dotC(col("va"), col("vb")) / sqrt(col("na") * col("nb")))
          .agg(count(lit(1)).as("pairs"),
            sum(when(col("cos_sim") > 0.8 &&
              col("id_b") === col("id_a") + 100000000L, 1L).otherwise(0L))
              .as("planted_found"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$nm%-20s $n%8d $cells%6d $dt%8.2f ${r.getLong(0)}%12d " +
          f"${r.getLong(1).toDouble / math.max(nPlanted, 1L)}%7.3f")
      }

      val nlist = math.max(8, (n / 500).toInt)
      pairwise("semdedup_kmeans", nlist, {
        val c0 = all.where(col("vec_id") < nlist)
          .select(col("vec_id").as("j"), col("v").as("c")).localCheckpoint()
        graft.ops.Round11.cAssign(all, c0, nlist)
          .withColumnRenamed("list_id", "cell").localCheckpoint()
      })
      val bBits = math.max(3, (63 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, n / 500))).toInt)
      pairwise("semdedup_signbucket", 1 << bBits, all.withColumn("cell",
        (0 until bBits).map(i =>
          when(expr(s"element_at(v, ${i + 1})") > 0, 1L << i).otherwise(0L))
          .reduce(_ + _)).localCheckpoint())
      if (n <= 10000)
        pairwise("semdedup_allpairs", 1,
          all.withColumn("cell", lit(0L)).localCheckpoint())
    }
  }

  /** spans regime (round 12): q235/q236's scale posture measured. The
    * docs generator plants a VERBATIM duplicate every 10th doc, so every
    * planted doc must emit one full-doc duplicated span (q235) and its
    * whole chunk sequence as duplicate chunks (q236). The claim under
    * test: both pipelines are LINEAR in token volume (gram/token explode
    * + map-side-combinable rollup + hash join + doc-partitioned windows —
    * no all-pairs term anywhere), and planted recall holds 1.0 at every
    * size (a curve that loses planted duplicates is pruning wrongly).
    * q235 recall = planted docs whose span covers the whole doc; q236
    * recall = saved duplicate tokens / planted token volume (== 1 when
    * exactly the planted copies dedup; > 1 only via chance collisions). */
  private def spansCurve(spark: SparkSession, sizes: Seq[Long]): Unit = {
    println(f"${"pipeline"}%-12s ${"n_docs"}%8s ${"sec"}%8s ${"rows"}%10s ${"recall"}%7s")
    for (n <- sizes) {
      val d = docs(spark, n, "real")
        .withColumn("source", col("lang")).localCheckpoint()
      val plantedRow = d.where(col("doc_id") % 10 === 9)
        .agg(count(lit(1)), sum(size(split(col("text"), " ")))).collect()(0)
      val (planted, plantedToks) = (plantedRow.getLong(0), plantedRow.getLong(1))
      for ((nm, hashed) <- Seq(("dup_spans", false), ("dup_spans_h64", true))) {
        val t0 = System.nanoTime()
        val spans = graft.ops.Round12c.dupSpans(d, hashKey = hashed).localCheckpoint()
        val nSpans = spans.count()
        val full = spans
          .join(d.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("len")), "doc_id")
          .where(col("doc_id") % 10 === 9 &&
            col("span_start") === 1 && col("span_toks") === col("len"))
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$nm%-12s $n%8d $dt%8.2f $nSpans%10d " +
          f"${full.toDouble / math.max(planted, 1L)}%7.3f")
      }
      locally {
        val t0 = System.nanoTime()
        val dup = graft.ops.Round12c.cdcDupChunks(d).localCheckpoint()
        val agg = dup.agg(count(lit(1)), coalesce(sum("saved_toks"), lit(0L)))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"${"cdc_chunks"}%-12s $n%8d $dt%8.2f ${agg.getLong(0)}%10d " +
          f"${agg.getLong(1).toDouble / math.max(plantedToks, 1L)}%7.3f")
      }
    }
  }

  /** ANN regime: measure brute-force / LSH-bucketed / IVF top-5 search for
    * Q=100 queries as the corpus grows, plus each approximate method's
    * recall@5 against the brute answer AT THAT SIZE (recall is the claim
    * the bucketed plans trade time for — a curve without it would hide
    * degenerating answers). Shapes are q41/q52/q62's production forms:
    * broadcast query side, bucket/list equi-joins, no all-pairs. */
  private def annCurve(spark: SparkSession, sizes: Seq[Long],
      want: Set[String] = Set.empty,
      mkVecs: (SparkSession, Long) => DataFrame = vecs): Unit = {
    import graft.plans.DotProduct.{dot => dotC, norm2 => n2C}
    val K = 5
    println(f"${"pipeline"}%-16s ${"n_vecs"}%8s ${"sec"}%8s ${"rows"}%10s ${"recall@5"}%9s")
    for (n <- sizes) {
      val emb = mkVecs(spark, n)
        .select(col("vec_id"), col("embedding").as("e"))
        .withColumn("n2", n2C(col("e")))
        .localCheckpoint()
      val q = emb.where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("n2").as("qn"))
      val wRank = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))

      // the thunk runs INSIDE the clock so eager steps (ivfIndex's
      // localCheckpoint build) are charged to their pipeline
      def timed(nm: String, mk: () => DataFrame,
          brute: Option[Set[(Long, Long)]]): Set[(Long, Long)] = {
        // pipeline filter (3rd CLI arg) — brute always runs (ground truth)
        if (want.nonEmpty && !want(nm) && brute.nonEmpty) return Set.empty
        val t0 = System.nanoTime()
        val rows = mk().select(col("qid"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val recall = brute.map(b => rows.intersect(b).size.toDouble / b.size)
        println(f"$nm%-16s $n%8d $dt%8.2f ${rows.size}%10d ${recall.map(r => f"$r%9.3f").getOrElse("    exact")}%s")
        rows
      }

      val brute = timed("brute_topk", () =>
        emb.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("cos_sim", dotC(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
          .withColumn("rnk", row_number().over(wRank)).where(col("rnk") <= K),
        None)

      // q52's hyperplane-LSH at 8 bits (256 buckets)
      def hyper(j: Int): org.apache.spark.sql.Column =
        transform(sequence(lit(0), lit(63)),
          k => ((lit(j.toLong) * 64 + k) * lit(2654435761L) % 97 - 48).cast("double"))
      for (bits <- Seq(4, 8)) timed(s"lsh_bucket$bits", () => {
        val be = emb.withColumn("bucket",
          (0 until bits).map(j => when(dotC(col("e"), hyper(j)) > 0, 1L << j).otherwise(0L))
            .reduce(_ + _)).localCheckpoint()
        val bq = be.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"), col("e").as("qe"), col("bucket"), col("n2").as("qn"))
        be.join(broadcast(bq), Seq("bucket")).where(col("vec_id") =!= col("qid"))
          .withColumn("cos_sim", dotC(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
          .withColumn("rnk", row_number().over(wRank)).where(col("rnk") <= K)
      }, Some(brute))

      // q220's multi-table OR'd LSH: L independent 8-bit sign tables over
      // the SAME hyperplane family (table t = hyperplanes t·8..t·8+7, so
      // table 0 IS lsh_bucket8's table); candidates = union of bucket-mates
      // across tables, exact cosine re-rank. Candidate volume is
      // Q·L·N/2^bits — L× the single table, recall 1−(1−p)^L.
      for (l <- Seq(4, 8)) timed(s"lsh_multi${l}x8", () => {
        val bits = 8
        val be = emb.select(col("vec_id"), col("e"), col("n2"),
            posexplode(array((0 until l).map(t =>
              (0 until bits).map(j =>
                when(dotC(col("e"), hyper(t * bits + j)) > 0, 1L << j).otherwise(0L))
                .reduce(_ + _)): _*)))
          .withColumnsRenamed(Map("pos" -> "t", "col" -> "bucket"))
          .localCheckpoint()
        val bq = be.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"), col("t"), col("bucket"))
        be.select("vec_id", "t", "bucket")
          .join(broadcast(bq), Seq("t", "bucket"))
          .where(col("vec_id") =!= col("qid"))
          .select("qid", "vec_id").distinct()
          .repartition(32)
          .join(emb, "vec_id")
          .join(broadcast(q), "qid")
          .withColumn("cos_sim", dotC(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
          .withColumn("rnk", row_number().over(wRank)).where(col("rnk") <= K)
      }, Some(brute))

      // Decorrelation control for the multi-table rows: same L×8-bit
      // budget, but each table draws from its OWN integer family (distinct
      // public hash-prime multiplier per table) instead of consecutive
      // slices of one family — tests whether the measured sub-independent
      // lift (SCALE.md §12) is family correlation or a property of the
      // isotropic data itself.
      for (l <- Seq(4)) timed(s"lsh_multi${l}x8d", () => {
        val bits = 8
        val prime = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
        def hyperD(t: Int, j: Int): org.apache.spark.sql.Column =
          transform(sequence(lit(0), lit(63)),
            k => ((lit(j.toLong) * 64 + k) * lit(prime(t)) % 97 - 48).cast("double"))
        val be = emb.select(col("vec_id"), col("e"), col("n2"),
            posexplode(array((0 until l).map(t =>
              (0 until bits).map(j =>
                when(dotC(col("e"), hyperD(t, j)) > 0, 1L << j).otherwise(0L))
                .reduce(_ + _)): _*)))
          .withColumnsRenamed(Map("pos" -> "t", "col" -> "bucket"))
          .localCheckpoint()
        val bq = be.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"), col("t"), col("bucket"))
        be.select("vec_id", "t", "bucket")
          .join(broadcast(bq), Seq("t", "bucket"))
          .where(col("vec_id") =!= col("qid"))
          .select("qid", "vec_id").distinct()
          .repartition(32)
          .join(emb, "vec_id")
          .join(broadcast(q), "qid")
          .withColumn("cos_sim", dotC(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
          .withColumn("rnk", row_number().over(wRank)).where(col("rnk") <= K)
      }, Some(brute))

      // q232's binary sign quantization: 1 bit/dim (two BIGINT words,
      // 8 bytes/vector — 16× smaller than the 16-byte PQ codes), Hamming
      // top-50 shortlist via popcount(xor) in codegen, exact cosine
      // re-rank of Q·50 rejoined raw vectors. No training, no codebooks —
      // the index build is ONE projection. The shortlist window is
      // qid-partitioned and rank-limited (WindowGroupLimit pushes the
      // top-50 map-side).
      for (short <- Seq(50, 200)) timed(s"hamming64_rr$short", () => {
        def word(lo: Int) = expr((1 to 32).map(i =>
          s"(CASE WHEN element_at(e, ${lo + i}) > 0 THEN ${1L << (i - 1)}L ELSE 0L END)")
          .mkString(" + "))
        val ce = emb.select(col("vec_id"), word(0).as("w0"), word(32).as("w1"))
          .localCheckpoint()
        val cq = ce.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"), col("w0").as("qw0"), col("w1").as("qw1"))
        ce.join(broadcast(cq), col("vec_id") =!= col("qid"))
          .withColumn("ham", expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)"))
          .withColumn("srnk", row_number().over(
            Window.partitionBy("qid").orderBy(col("ham"), col("vec_id"))))
          .where(col("srnk") <= short)
          .select("qid", "vec_id")
          .repartition(32) // the q97 probe-side lever: spread the re-rank CPU
          .join(emb, "vec_id")
          .join(broadcast(q), "qid")
          .withColumn("cos_sim", dotC(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
          .withColumn("rnk", row_number().over(wRank)).where(col("rnk") <= K)
      }, Some(brute))

      // IVF-routed binary codes — the composition the hamming64_rr50 note
      // names as the production recall fix: route queries to nprobe=8 of
      // 64 coarse lists (q62's index), Hamming-shortlist ONLY within the
      // probed lists (≈1/8 of the corpus per query — less error-ball
      // flooding than the corpus-wide shortlist), exact cosine re-rank.
      // Scan cost per query: nprobe/nlist of the corpus × 8 bytes.
      timed("ivf64_hamming_rr50", () => {
        val (index, centroids) = graft.ops.Ann.ivfIndex(
          emb.select(col("vec_id"), col("e").as("embedding")), nlist = 64)
        def word(c: String, lo: Int) = expr((1 to 32).map(i =>
          s"(CASE WHEN element_at($c, ${lo + i}) > 0 THEN ${1L << (i - 1)}L ELSE 0L END)")
          .mkString(" + "))
        val codes = index.select(col("vec_id"), col("list_id"),
          word("e", 0).as("w0"), word("e", 32).as("w1")).localCheckpoint()
        // route with the SAME L2 metric the index assignment used
        val qprobe = emb.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"), col("e"), col("n2"))
          .crossJoin(broadcast(centroids.select(col("list_id"), col("ce"))))
          .withColumn("d", col("n2") + n2C(col("ce"))
            - lit(2.0) * dotC(col("e"), col("ce")))
          .withColumn("pr", row_number().over(
            Window.partitionBy("qid").orderBy(col("d"), col("list_id"))))
          .where(col("pr") <= 8)
          .select(col("qid"), col("list_id"))
        val qcodes = emb.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"),
            word("e", 0).as("qw0"), word("e", 32).as("qw1"))
        codes.join(broadcast(qprobe), Seq("list_id"))
          .where(col("vec_id") =!= col("qid"))
          .join(broadcast(qcodes), Seq("qid"))
          .withColumn("ham", expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)"))
          .withColumn("srnk", row_number().over(
            Window.partitionBy("qid").orderBy(col("ham"), col("vec_id"))))
          .where(col("srnk") <= 50)
          .select("qid", "vec_id")
          .repartition(32)
          .join(emb, "vec_id")
          .join(broadcast(q), "qid")
          .withColumn("cos_sim", dotC(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
          .withColumn("rnk", row_number().over(wRank)).where(col("rnk") <= K)
      }, Some(brute))

      // q62's IVF — index build (inside the clock: the build IS the cost)
      // + 100-query probe at nprobe=8/64
      timed("ivf64_probe8", () => {
        val (index, centroids) = graft.ops.Ann.ivfIndex(
          emb.select(col("vec_id"), col("e").as("embedding")), nlist = 64)
        graft.ops.Ann.ivfTopK(index, centroids,
          q.select(col("qid"), col("qe")), k = K, nprobe = 8)
      }, Some(brute))

      // q205/q206's PQ — codebook train (inside the clock: the build IS
      // the cost) + the packed-code map-side ADC scan (q206's shape).
      // Recall vs the COSINE brute answer also charges the L2-vs-cosine
      // metric gap — the honest number for swapping PQ into this harness.
      def qsubAll = graft.ops.Round10n.pqSub(emb.where(col("vec_id") < 100)
        .select(col("vec_id"), col("e").as("embedding")))
        .withColumnRenamed("vec_id", "qid")
      def adcAll() = {
        val (codes, cent) = graft.ops.Round10n.pqCodebook(
          emb.select(col("vec_id"), col("e").as("embedding")))
        graft.ops.Round10n.adcDistances(codes, cent, qsubAll, maxQ = 100)
      }
      val wAdc = Window.partitionBy("qid").orderBy(col("adc_dist"), col("vid"))
      timed("pq_adc", () =>
        adcAll()
          .withColumn("rnk", row_number().over(wAdc)).where(col("rnk") <= K)
          .select(col("qid"), col("vid").as("vec_id")),
        Some(brute))

      // PQ as production runs it: ADC generates top-50 CANDIDATES from
      // the codes, exact cosine re-ranks the 50 raw vectors per query
      // (the IVF-PQ "refine" step — candidate IO stays 8 bytes/vector,
      // exactness returns at the re-rank)
      timed("pq_rerank50", () =>
        adcAll()
          .withColumn("rnk", row_number().over(wAdc)).where(col("rnk") <= 50)
          .join(emb.select(col("vec_id").as("vid"), col("e").as("ve"),
            col("n2").as("vn")), "vid")
          .join(broadcast(q), "qid")
          .withColumn("cos_sim", dotC(col("qe"), col("ve")) / sqrt(col("qn") * col("vn")))
          .withColumn("rr", row_number().over(
            Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vid"))))
          .where(col("rr") <= K)
          .select(col("qid"), col("vid").as("vec_id")),
        Some(brute))

      // The production posture: the codebook trains ONCE on a FIXED 5k
      // sample (constant cost at any N), then one encode pass over the
      // corpus — 16 broadcast distances/subvector instead of pq_adc's
      // 3 full training passes. Same re-rank refinement as above.
      timed("pq_strain_rr50", () => {
        val cent = graft.ops.Round10n.pqCodebook(
          emb.where(col("vec_id") < 5000)
            .select(col("vec_id"), col("e").as("embedding")))._2
        val codes = graft.ops.Round10n.pqEncode(
          emb.select(col("vec_id"), col("e").as("embedding")), cent)
        graft.ops.Round10n.adcDistances(codes, cent, qsubAll, maxQ = 100)
          .withColumn("rnk", row_number().over(wAdc)).where(col("rnk") <= 50)
          .join(emb.select(col("vec_id").as("vid"), col("e").as("ve"),
            col("n2").as("vn")), "vid")
          .join(broadcast(q), "qid")
          .withColumn("cos_sim", dotC(col("qe"), col("ve")) / sqrt(col("qn") * col("vn")))
          .withColumn("rr", row_number().over(
            Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vid"))))
          .where(col("rr") <= K)
          .select(col("qid"), col("vid").as("vec_id"))
      }, Some(brute))

      // q219's composition at production parameters, on q219's exact
      // integer grid (FLOOR(x·1e6) longs): sample-trained coarse quantizer
      // (64 lists), ONE corpus routing pass, PQ on the RESIDUALS at 16
      // subspaces x `kc` centroids (kc=256 => 128-bit codes, 16 B/vector)
      // trained on the same fixed 5k sample, one encode pass,
      // per-(query, probed-list) LUTs, ADC over the probed lists' codes
      // only (nprobe/nlist of the corpus), optional exact top-50 re-rank.
      //
      // Every argmin uses a PRIMITIVE long key (dist*k + j): min(struct)
      // / min(array) / min_by / first(array) all fall back to
      // SortAggregate (probed in-session), which SORTS the xk candidate
      // expansion WITH the vector payload -- measured 28-77 s at 5k
      // vectors; the primitive key keeps HashAggregate + map-side
      // combine and the vector array rejoins by id afterward.
      // Overflow bounds (int64-safe, the q219 discipline): coarse dist
      // <= 64*(2e6)^2 = 2.56e14, *64+j <= 1.7e16; subspace dist <=
      // 4*(4e6)^2 = 6.4e13, *256+j <= 1.7e16; ADC sum <= 16*6.4e13 ~ 1e15.
      def distD(dim: Int, a: String, b: String): String = (1 to dim)
        .map(i => s"(element_at($a, $i) - element_at($b, $i)) * (element_at($a, $i) - element_at($b, $i))")
        .mkString(" + ")
      def ivfPq(kc: Int, nprobe: Int, rerank: Boolean,
          wideEncode: Boolean = false): DataFrame = {
        val nlist = 64
        val qv = emb.select(col("vec_id"),
            expr("transform(e, x -> CAST(FLOOR(x * 1e6) AS BIGINT))").as("v"))
          .repartition(32).localCheckpoint()
        val sample = qv.where(col("vec_id") < 5000)
        // 64-dim distance through the native DotProduct (small generated
        // code — the unrolled 64-term string tripled per-plan codegen
        // time): n2+n2−2·dot on the long grid stays ≤ 2.56e14 < 2^53, so
        // the double arithmetic is EXACT and the long cast is lossless.
        def cDist(a: Column, b: Column): Column = {
          val (ad, bd) = (a.cast("array<double>"), b.cast("array<double>"))
          n2C(ad) + n2C(bd) - lit(2.0) * dotC(ad, bd)
        }
        def cAssign(xs: DataFrame, cs: DataFrame): DataFrame =
          xs.join(broadcast(cs), lit(true))
            .groupBy("vec_id")
            .agg(min(cDist(col("v"), col("c")).cast("long") * lit(nlist.toLong) + col("j")).as("key"))
            .select(col("vec_id"), pmod(col("key"), lit(nlist.toLong)).as("list_id"))
            .join(xs, Seq("vec_id"))
        def cUpdate(assigned: DataFrame, prev: DataFrame): DataFrame = {
          val sums = (1 to 64).map(i => sum(expr(s"element_at(v, $i)")).as(s"sx$i"))
          val newC = assigned.groupBy(col("list_id").as("j"))
            .agg(count(lit(1)).as("n"), sums: _*)
            .select(col("j"), array((1 to 64).map(i =>
              floor(col(s"sx$i").cast("double") / col("n")).cast("long")): _*).as("cnew"))
          prev.join(newC, Seq("j"), "left")
            .select(col("j"), coalesce(col("cnew"), col("c")).as("c"))
        }
        val seeds = sample.where(col("vec_id") < nlist)
          .select(col("vec_id").as("j"), col("v").as("c"))
        val c1 = cUpdate(cAssign(sample, seeds), seeds).localCheckpoint()
        val resid = cAssign(qv, c1)
          .join(broadcast(c1.withColumnRenamed("j", "list_id")), Seq("list_id"))
          .select(col("vec_id"), col("list_id"),
            zip_with(col("v"), col("c"), (a, b) => a - b).as("r"))
        // explicit 32-way spread: the routing pass ends in a byte-small
        // shuffle AQE would coalesce to ~1 partition, serializing the xkc
        // broadcast-join expansion below onto one task (the q78/q97 lesson).
        // The checkpoint sits on RESID (round 12): both the training
        // explode and the batched encode consume it, and an un-checkpointed
        // resid would replay the corpus routing pass per consumer.
        val residC = resid.repartition(32).localCheckpoint()
        val sub = residC.select(col("vec_id"), col("list_id"),
            posexplode(expr("transform(sequence(0, 15), s -> slice(r, 4 * s + 1, 4))")))
          .withColumnsRenamed(Map("pos" -> "s", "col" -> "v"))
        def pAssign(xs: DataFrame, cs: DataFrame): DataFrame =
          xs.join(broadcast(cs), Seq("s"))
            .groupBy("vec_id", "list_id", "s")
            .agg(min(expr(distD(4, "v", "c")) * lit(kc.toLong) + col("j")).as("key"))
            .select(col("vec_id"), col("list_id"), col("s"),
              pmod(col("key"), lit(kc.toLong)).cast("int").as("code"))
        def pUpdate(assigned: DataFrame, xs: DataFrame, prev: DataFrame): DataFrame = {
          val sums = (1 to 4).map(i => sum(expr(s"element_at(v, $i)")).as(s"sx$i"))
          val newC = assigned.join(xs, Seq("vec_id", "list_id", "s"))
            .groupBy(col("s"), col("code").as("j"))
            .agg(count(lit(1)).as("n"), sums: _*)
            .select(col("s"), col("j"), array((1 to 4).map(i =>
              floor(col(s"sx$i").cast("double") / col("n")).cast("long")): _*).as("cnew"))
          prev.join(newC, Seq("s", "j"), "left")
            .select(col("s"), col("j"), coalesce(col("cnew"), col("c")).as("c"))
        }
        val psample = sub.where(col("vec_id") < 5000)
        val p0 = psample.where(col("vec_id") < kc)
          .select(col("s"), col("vec_id").cast("int").as("j"), col("v").as("c"))
        val p1 = pUpdate(pAssign(psample, p0), psample, p0).localCheckpoint()
        // ENCODE batching — MEASURED NEGATIVE RESULT (round 12, VERDICT
        // #7): the hypothesis was that the per-(vec, s) join against the
        // 256-candidate codebook (N·16·kc ≈ 1B rows at 250k vectors) pays
        // per-row machinery 16× that a "wide" form could amortize — one
        // 64-wide codebook row per candidate j and ALL 16 subspace argmin
        // keys computed per (vec, j) row (N·kc rows, 16× fewer, identical
        // arithmetic and codes). Measured at 250k×64 under the same
        // machine weather, the wide form is ~5× SLOWER, not faster:
        // rr50 wide 216.9 s (BroadcastNestedLoopJoin) / 181.2 s
        // (constant-key BroadcastHashJoin — join strategy is NOT the
        // cause) vs 37–38 s for the round-11 narrow form. The 16-wide
        // HashAggregate update (16 min functions × 8 element_at + mults
        // each) generates a function past JIT-able size, so the hot loop
        // runs deoptimized — the narrow single-primitive-min update is
        // tiny and JITs. Kept behind wideEncode=true as the measured
        // control; the narrow form stays the production path (per-subspace
        // BLAS batching remains the off-Spark answer, SCALE.md §12).
        val p1w = p1.groupBy("j").agg(
            transform(array_sort(collect_list(struct(col("s"), col("c")))),
              x => x("c")).as("cs"))
          .select(col("j"), flatten(col("cs")).as("c64"))
        def subKey(sIdx: Int): Column = min(
          (0 until 4).map { i =>
            val d = expr(s"element_at(r, ${4 * sIdx + i + 1}) - element_at(c64, ${4 * sIdx + i + 1})")
            d * d
          }.reduce(_ + _) * lit(kc.toLong) + col("j")).as(s"k$sIdx")
        val packed = (if (wideEncode)
          residC.withColumn("one", lit(1))
            .join(broadcast(p1w.withColumn("one", lit(1))), "one")
            .groupBy("vec_id", "list_id")
            .agg(subKey(0), (1 until 16).map(subKey): _*)
            .select(col("vec_id"), col("list_id"),
              array((0 until 16).map(sIdx =>
                pmod(col(s"k$sIdx"), lit(kc.toLong)).cast("int")): _*).as("ca"))
        else // the round-11 per-(vec, s) form — the measured winner
          pAssign(sub.repartition(32).localCheckpoint(), p1)
            .groupBy("vec_id", "list_id")
            .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
              x => x("code")).as("ca")))
          .repartition(32) // same lever for the ADC lookup scan below
        val qq = qv.where(col("vec_id") < 100)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val probed = qq.join(broadcast(c1), lit(true))
          .withColumn("cdist", cDist(col("qv"), col("c")))
          .withColumn("pr", row_number().over(
            Window.partitionBy("qid").orderBy(col("cdist"), col("j"))))
          .where(col("pr") <= nprobe)
          .select(col("qid"), col("j").as("list_id"),
            zip_with(col("qv"), col("c"), (a, b) => a - b).as("qr"))
        val lut = probed.select(col("qid"), col("list_id"),
            posexplode(expr("transform(sequence(0, 15), s -> slice(qr, 4 * s + 1, 4))")))
          .withColumnsRenamed(Map("pos" -> "s", "col" -> "v"))
          .join(broadcast(p1), Seq("s"))
          .select(col("qid"), col("list_id"),
            (col("s") * kc + col("j")).as("idx"), expr(distD(4, "v", "c")).as("ld"))
          .groupBy("qid", "list_id")
          .agg(transform(array_sort(collect_list(struct(col("idx"), col("ld")))),
            x => x("ld")).as("la"))
        val lookupSum = (0 until 16)
          .map(s => s"element_at(la, CAST(${s * kc} + element_at(ca, ${s + 1}) + 1 AS INT))")
          .mkString(" + ")
        val wAdc = Window.partitionBy("qid").orderBy(col("adc_dist"), col("vid"))
        val adc = packed.join(broadcast(lut), Seq("list_id"))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("vid"), expr(lookupSum).as("adc_dist"))
        if (!rerank)
          adc.withColumn("rnk", row_number().over(wAdc)).where(col("rnk") <= K)
            .select(col("qid"), col("vid").as("vec_id"))
        else
          adc.withColumn("rnk", row_number().over(wAdc)).where(col("rnk") <= 50)
            .join(emb.select(col("vec_id").as("vid"), col("e").as("ve"),
              col("n2").as("vn")), "vid")
            .join(broadcast(q), "qid")
            .withColumn("cos_sim", dotC(col("qe"), col("ve")) / sqrt(col("qn") * col("vn")))
            .withColumn("rr", row_number().over(
              Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vid"))))
            .where(col("rr") <= K)
            .select(col("qid"), col("vid").as("vec_id"))
      }
      timed("ivfpq128_probe8", () => ivfPq(kc = 256, nprobe = 8, rerank = false), Some(brute))
      timed("ivfpq128_rr50", () => ivfPq(kc = 256, nprobe = 8, rerank = true), Some(brute))
      // the wide-encode control — measured ~5× SLOWER (negative result
      // above); opt-in by explicit name only so the default sweep never
      // pays ~200 s for a known-worse variant
      if (want("ivfpq128_rr50w"))
        timed("ivfpq128_rr50w", () =>
          ivfPq(kc = 256, nprobe = 8, rerank = true, wideEncode = true), Some(brute))
      // PQ codebook-CAPACITY sweep (round 14): the `clustered` regime
      // showed the rr50 recall decay is the fixed-size codebook, not the
      // routing (plain IVF holds 1.000) — these rows measure the capacity
      // axis directly (kc = centroids/subspace: 16 → 4-bit codes, 64 →
      // 6-bit, vs the default 256). Opt-in by name (each pays a full
      // training + encode).
      for (kcv <- Seq(16, 64))
        if (want(s"ivfpq_kc${kcv}_rr50"))
          timed(s"ivfpq_kc${kcv}_rr50", () =>
            ivfPq(kc = kcv, nprobe = 8, rerank = true), Some(brute))
    }
  }

  /** prefix regime (round 13): q238's windowless prefix-signature form vs
    * the round-12 bucketed-window form it replaced, on the ADVERSARIAL
    * corpus that breaks the window: EVERY doc opens with the same 16-token
    * boilerplate (the realistic web-corpus case — shared headers/licence
    * blocks), so the old first-2-token bucket is ONE bucket and its
    * window sorts the whole corpus — full text as the sort key — on a
    * single task. Claim: the new form stays near-linear (per-doc windows,
    * a (p, g) count rollup, a semi-join — a hot PREFIX is a hot combiner
    * GROUP, partial-aggregated map-side, never a hot task); the old form
    * degrades toward single-task serialization as n grows. */
  private def prefixCurve(spark: SparkSession, sizes: Seq[Long]): Unit = {
    println(f"${"pipeline"}%-16s ${"n_docs"}%8s ${"sec"}%8s ${"cacheable"}%12s")
    val boiler = (1 to 16).map(i => s"bp$i").mkString(" ")
    for (n <- sizes) {
      val d = docs(spark, n, "real")
        .withColumn("text", concat(lit(boiler + " "), col("text")))
        .localCheckpoint()
      locally {
        val t0 = System.nanoTime()
        val r = graft.ops.Round12c.prefixCacheStats(d)
          .agg(sum("cacheable_toks")).collect()(0).getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"${"prefix_sig"}%-16s $n%8d $dt%8.2f $r%12d")
      }
      locally { // the round-12 windowed form, kept as the measured control
        def lcpE(a: String, b: String) = expr(
          s"""CASE WHEN $b IS NULL THEN 0L ELSE coalesce(
             |  nullif(array_position(zip_with($a, $b,
             |    (x, y) -> if(x IS NOT NULL AND y IS NOT NULL AND x = y, 1, 0)),
             |    0), 0) - 1,
             |  size($a)) END""".stripMargin).cast("long")
        val t0 = System.nanoTime()
        val t = d.select(col("doc_id"), col("text"),
            split(col("text"), " ").as("tk"))
          .withColumn("bucket", expr("array_join(slice(tk, 1, 2), ' ')"))
        val w = Window.partitionBy("bucket").orderBy("text", "doc_id")
        val r = t.withColumn("prv", lag("tk", 1).over(w))
          .withColumn("nxt", lead("tk", 1).over(w))
          .withColumn("best", greatest(lcpE("tk", "prv"), lcpE("tk", "nxt")))
          .agg(sum("best")).collect()(0).getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"${"prefix_window"}%-16s $n%8d $dt%8.2f $r%12d")
      }
    }
  }

  /** knngraph regime (round 13): q234/q244's build cost and graph RECALL
    * at scale with nlist ∝ N (the q231 posture — per-cell population
    * pinned ~500). Per size: frozen-seed centroids (the graph stages are
    * what the curve prices; production trains on a fixed sample), one
    * probe ranking (×nprobe), per-cell pairwise equi-join, top-3 window;
    * recall measured against brute 3-NN over a 100-vector carve (carve×N
    * — the q243 audit posture). The claim: 2-probe pays ~2× the
    * candidate volume for a recall step-change, and both stay linear-ish
    * in N at pinned cell population (the probe-assign stage is the
    * honest Θ(N·nlist) bend the semdedup curve already names). */
  private def knnGraphCurve(spark: SparkSession, sizes: Seq[Long],
      mkVecs: (SparkSession, Long) => DataFrame = vecs): Unit = {
    import graft.plans.DotProduct.{dot => dotC, norm2 => n2C}
    def cDist(a: Column, b: Column): Column = {
      val (ad, bd) = (a.cast("array<double>"), b.cast("array<double>"))
      n2C(ad) + n2C(bd) - lit(2.0) * dotC(ad, bd)
    }
    println(f"${"pipeline"}%-16s ${"n_vecs"}%8s ${"nlist"}%6s ${"sec"}%8s ${"edges"}%10s ${"recall@3"}%9s")
    for (n <- sizes) {
      val nlist = math.max(8, (n / 500).toInt)
      val qv = mkVecs(spark, n).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(FLOOR(x * 1e6) AS BIGINT))").as("v"))
        .repartition(32).localCheckpoint()
      val cent = qv.where(col("vec_id") < nlist)
        .select(col("vec_id").as("j"), col("v").as("c")).localCheckpoint()
      // audit carve DISJOINT from the seed set: a seed vector is its own
      // cell's center, so auditing seeds inflates recall (its true
      // neighbors are exactly the vectors routed to its cell — measured
      // 0.97 vs 0.45 for a generic carve at 50k/nlist=100)
      val carve = qv.where(col("vec_id") % 97 === 3 && col("vec_id") >= nlist)
        .where(col("vec_id") < nlist + 97 * 100)
        .select(col("vec_id").as("aid"), col("v").as("av"))
      val brute = qv.crossJoin(broadcast(carve))
        .where(col("vec_id") =!= col("aid"))
        .withColumn("d2", cDist(col("v"), col("av")).cast("long"))
        .withColumn("r", row_number().over(
          Window.partitionBy("aid").orderBy(col("d2"), col("vec_id"))))
        .where(col("r") <= 3)
        .collect().map(r => (r.getAs[Long]("aid"), r.getAs[Long]("vec_id"))).toSet
      for (np <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        // probe ranking carries ONLY primitives through the window; the
        // vector payload rejoins by id (the q234/SCALE §12 discipline)
        val pr = qv.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("j"),
            cDist(col("v"), col("c")).cast("long").as("cd"))
          .withColumn("probe", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("cd"), col("j"))))
          .where(col("probe") <= np)
          .select(col("vec_id"), col("j").as("list_id"), col("probe"))
          .repartition(32).localCheckpoint()
        val memb = pr.where(col("probe") === 1)
          .join(qv, Seq("vec_id"))
          .select(col("vec_id").as("nbr_id"), col("list_id"), col("v").as("wv"))
          .repartition(32).localCheckpoint()
        val edges = pr.join(qv, Seq("vec_id"))
          .join(memb, Seq("list_id"))
          .where(col("vec_id") =!= col("nbr_id"))
          .withColumn("d2", cDist(col("v"), col("wv")).cast("long"))
          .withColumn("r", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("d2"), col("nbr_id"))))
          .where(col("r") <= 3)
          .select(col("vec_id"), col("nbr_id"))
          .localCheckpoint()
        val ne = edges.count()
        val got = edges.where(col("vec_id") % 97 === 3 &&
            col("vec_id") >= nlist && col("vec_id") < nlist + 97 * 100)
          .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"))).toSet
        val recall = (got & brute).size.toDouble / math.max(brute.size, 1)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"${s"knngraph_${np}p"}%-16s $n%8d $nlist%6d $dt%8.2f $ne%10d $recall%9.3f")
      }
    }
  }

  /** silh regime (round 14): q247's two silhouette forms, timed and
    * BIT-COMPARED at growing N — the carve×N pairwise pass (the round-13
    * internals, which the DuckDB oracle still replays) vs the
    * sufficient-statistics form ((n_j, Σv, Σv²) per cell — the round-14
    * declared internals). The identity Σ_m d²(v,m) = n_j·‖v‖² − 2·v·S_j
    * + Q_j is exact in int64, so `equal` must print true at every size;
    * the COST separates: the carve form touches N·|carve| pairs, the
    * stats form one N×64 explode + a |carve|·nlist·64 join. Clustered
    * corpus (the silhouette is the audit you run on data with structure),
    * fixed nlist = 64, carve = 100 vectors. */
  private def silhCurve(spark: SparkSession, sizes: Seq[Long]): Unit = {
    import graft.plans.DotProduct.{dot => dotC, norm2 => n2C}
    val nlist = 64
    println(f"${"pipeline"}%-12s ${"n_vecs"}%8s ${"nlist"}%6s ${"sec"}%8s ${"equal"}%6s")
    for (n <- sizes) {
      val qv = clusteredVecs(spark, n).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(FLOOR(x * 1e6) AS BIGINT))").as("v"))
        .repartition(32).localCheckpoint()
      val cent = qv.where(col("vec_id") < nlist)
        .select(col("vec_id").as("j"), col("v").as("c")).localCheckpoint()
      val wn = graft.ops.Round11.cAssign(qv, cent, nlist)
        .select(col("vec_id"), col("list_id"),
          col("v").cast("array<double>").as("vd"))
        .repartition(32).localCheckpoint()
      val carve = wn.where(col("vec_id") % 97 === 3)
        .select(col("vec_id").as("aid"), col("list_id").as("own_list"),
          col("vd").as("av"))
        .limit(100).localCheckpoint()

      def finish(stats: DataFrame): Array[(Long, Long, Double, Double, Double)] = {
        val own = stats.where(col("list_id") === col("own_list") && col("md").isNotNull)
          .select(col("aid").as("vec_id"), col("md").as("a"))
        val oth = stats.where(col("list_id") =!= col("own_list"))
          .groupBy(col("aid").as("vec_id")).agg(min("md").as("b"))
        carve.select(col("aid").as("vec_id"), col("own_list"))
          .join(own, Seq("vec_id"), "left")
          .join(oth, Seq("vec_id"), "left")
          .withColumn("s", when(col("a").isNull || col("b").isNull, lit(0.0))
            .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
          .orderBy("vec_id")
          .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("own_list"),
            Option(r.getAs[java.lang.Double]("a")).fold(Double.NaN)(_.doubleValue),
            Option(r.getAs[java.lang.Double]("b")).fold(Double.NaN)(_.doubleValue),
            r.getAs[Double]("s")))
      }

      // bit-pattern compare: doubleToLongBits so a null→NaN sentinel
      // compares equal to itself (tuple equality would fail on NaN)
      def keyOf(t: (Long, Long, Double, Double, Double)): String =
        s"${t._1}|${t._2}|${java.lang.Double.doubleToLongBits(t._3)}|" +
          s"${java.lang.Double.doubleToLongBits(t._4)}|${java.lang.Double.doubleToLongBits(t._5)}"
      def timed(nm: String, mk: () => Array[(Long, Long, Double, Double, Double)],
          base: Option[Array[(Long, Long, Double, Double, Double)]])
          : Array[(Long, Long, Double, Double, Double)] = {
        val t0 = System.nanoTime()
        val r = mk()
        val dt = (System.nanoTime() - t0) / 1e9
        val eq = base.map(b => if (r.length == b.length &&
          r.zip(b).forall { case (x, y) => keyOf(x) == keyOf(y) }) "true" else "FALSE")
        println(f"$nm%-12s $n%8d $nlist%6d $dt%8.2f ${eq.getOrElse("  base")}%6s")
        r
      }

      val carveForm = timed("silh_carve", () => finish {
        wn.select(col("vec_id").as("mid"), col("list_id"), col("vd").as("wd"))
          .crossJoin(broadcast(carve))
          .where(col("mid") =!= col("aid"))
          .withColumn("d2", (n2C(col("av")) + n2C(col("wd"))
            - lit(2.0) * dotC(col("av"), col("wd"))).cast("long"))
          .groupBy("aid", "own_list", "list_id")
          .agg(sum("d2").as("sd2"), count(lit(1)).as("cn"))
          .withColumn("md", col("sd2").cast("double") / col("cn").cast("double"))
          .localCheckpoint()
      }, None)

      timed("silh_stats", () => finish {
        val sLong = wn.select(col("list_id"), posexplode(col("vd")))
          .select(col("list_id"), col("pos"), col("col").cast("long").as("vk"))
          .groupBy("list_id", "pos")
          .agg(sum("vk").as("sk"), sum(col("vk") * col("vk")).as("qk"))
          .localCheckpoint()
        val cell = sLong.groupBy("list_id").agg(sum("qk").as("qj"))
          .join(wn.groupBy("list_id").agg(count(lit(1)).as("nj")), Seq("list_id"))
        val av = carve.select(col("aid"), posexplode(col("av")))
          .select(col("aid"), col("pos"), col("col").cast("long").as("ak"))
          .localCheckpoint()
        val a2 = av.groupBy("aid").agg(sum(col("ak") * col("ak")).as("a2"))
        av.join(broadcast(sLong), Seq("pos"))
          .groupBy("aid", "list_id").agg(sum(col("ak") * col("sk")).as("dot_s"))
          .join(broadcast(cell), Seq("list_id"))
          .join(broadcast(a2), Seq("aid"))
          .join(broadcast(carve.select(col("aid"), col("own_list"))), Seq("aid"))
          .withColumn("sd2",
            col("nj") * col("a2") - lit(2L) * col("dot_s") + col("qj"))
          .withColumn("md", when(col("list_id") === col("own_list"),
              when(col("nj") > 1,
                col("sd2").cast("double") / (col("nj") - 1).cast("double")))
            .otherwise(col("sd2").cast("double") / col("nj").cast("double")))
          .localCheckpoint()
      }, Some(carveForm))
    }
  }

  /** Round-15 measurement (verdict #6): candidate VOLUME of the 4×4 LSH
    * band join on dictionary-ranked tids across three hash families —
    * legacy (4i+3), the wrapping-but-correlated 48271·(i+1) interim, and
    * the 69621-power family now in production (`LlmExt2.mhMults`).
    * Reported per (corpus, family, size):
    *  - cand_rows = Σ_bands Σ_buckets C(sz,2) — the rows the band
    *    self-join MATERIALIZES (its shuffle+verify cost), computed
    *    analytically from bucket sizes so the degenerate family's
    *    quadratic blowup is measurable at sizes where actually running
    *    the join would be prohibitive (that blowup is the finding);
    *  - block_pairs = Σ_lang C(n_lang,2) — the all-pairs ceiling;
    *  - cand_pct = cand_rows / block_pairs.
    * The legacy family's degeneracy is vocabulary-size-dependent (it
    * only fails to wrap on SMALL tids), so the adv corpus (31-token
    * vocab — the gate corpus's regime) shows the collapse while real
    * (~66k vocab) shows the families converge once ranks wrap anyway. */
  private def mhFamilyCurve(spark: SparkSession, sizes: Seq[Long],
      regimes: Seq[String]): Unit = {
    // pow = the production family (LlmExt2.mhMults, 69621^(i+1) mod P):
    // multiplicatively unrelated multipliers. wrap's 48271·(i+1) family
    // shares the factor 48271 — every hash is a small-k multiple of the
    // same y = 48271·id mod P, so the 16 argmins stay correlated and
    // band agreement runs far above the S-curve; measured below.
    val families: Seq[(String, Column => Column)] = Seq(
      "legacy" -> (i => lit(4) * i + 3),
      "wrap" -> (i => lit(48271) * (i + 1) % P),
      "pow" -> (i => element_at(
        array(graft.ops.LlmExt2.mhMults.map(lit): _*), (i + 1).cast("int"))))
    println(f"${"corpus"}%-6s ${"family"}%-7s ${"n_docs"}%8s ${"sec"}%7s ${"cand_rows"}%13s ${"block_pairs"}%13s ${"cand_pct"}%9s")
    for (rg <- regimes; n <- sizes) {
      val d = docs(spark, n, rg).localCheckpoint()
      val toks = d.select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val tokIds = toks.join(graft.ops.LlmExt2.tokenDict(toks), "tok")
        .groupBy("doc_id", "lang")
        .agg(collect_list(col("tid").cast("long")).as("ids"))
        .localCheckpoint() // both families hash the same id table
      val blockPairs = tokIds.groupBy("lang").agg(count(lit(1)).as("c"))
        .agg(sum((col("c") * (col("c") - 1) / 2).cast("long"))).collect()(0).getLong(0)
      for ((fam, mult) <- families; exact <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val mh = tokIds.withColumn("mh", transform(sequence(lit(0), lit(15)),
          i => array_min(transform(col("ids"),
            id => (mult(i) * id + (lit(7) * i + 5)) % P))))
        // exact = the collision-FREE band key (two radix-P longs per
        // band: lo = mh1 + P·mh2, hi = mh3 + P·mh4, each < P² < 2^63)
        // vs the legacy lossy 131-chain — isolates how much candidate
        // volume is CHAIN collisions rather than minhash agreement
        val sigs =
          if (exact) mh.select(col("lang"), posexplode(transform(
              sequence(lit(0), lit(3)),
              b => struct(
                (element_at(col("mh"), b * 4 + 1)
                  + element_at(col("mh"), b * 4 + 2) * P).as("lo"),
                (element_at(col("mh"), b * 4 + 3)
                  + element_at(col("mh"), b * 4 + 4) * P).as("hi")))))
            .select(col("lang"), col("pos").as("band"),
              col("col.lo").as("sig"), col("col.hi").as("sig2"))
          else mh.select(col("lang"),
            posexplode(graft.ops.LlmExt2.bandSigsFromMh(col("mh"))))
            .withColumnsRenamed(Map("pos" -> "band", "col" -> "sig"))
            .withColumn("sig2", lit(0L))
        val candRows = sigs.groupBy("lang", "band", "sig", "sig2")
          .agg(count(lit(1)).as("c"))
          .agg(sum((col("c") * (col("c") - 1) / 2).cast("long"))).collect()(0).getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        val pct = 100.0 * candRows / math.max(1L, blockPairs)
        val tag = fam + (if (exact) "+x" else "")
        println(f"$rg%-6s $tag%-9s $n%8d $dt%7.2f $candRows%13d $blockPairs%13d $pct%8.2f%%")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val regime = args.headOption.getOrElse("real")
    val sizes = (if (args.length > 1) args(1) else regime match {
      case "adv"      => "5000,10000,20000"
      case "ann"      => "5000,50000,250000"
      case "kcore"    => "30000,100000,300000,1000000"
      case "semdedup" => "10000,50000,250000"
      case "spans"    => "20000,80000,320000"
      case "prefix"   => "20000,80000,320000"
      case "knngraph" => "10000,50000,250000"
      case "clustered" => "10000,50000,250000"
      case "silh"     => "50000,250000,1000000"
      case "mhfamily" => "20000,80000,320000"
      case _          => "5000,50000,250000"
    }).split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (regime == "ann") {
      // warm the session so the first size isn't charged JVM spin-up
      vecs(spark, 1000).selectExpr("sum(element_at(embedding, 1))").collect()
      annCurve(spark, sizes,
        if (args.length > 2) args(2).split(",").map(_.trim).toSet else Set.empty)
      spark.stop()
      return
    }
    if (regime == "semdedup") {
      vecs(spark, 1000).selectExpr("sum(element_at(embedding, 1))").collect()
      semdedupCurve(spark, sizes)
      spark.stop()
      return
    }
    if (regime == "spans") {
      docs(spark, 1000, "real").selectExpr("sum(length(text))").collect()
      spansCurve(spark, sizes)
      spark.stop()
      return
    }
    if (regime == "prefix") {
      docs(spark, 1000, "real").selectExpr("sum(length(text))").collect()
      prefixCurve(spark, sizes)
      spark.stop()
      return
    }
    if (regime == "knngraph") {
      vecs(spark, 1000).selectExpr("sum(element_at(embedding, 1))").collect()
      knnGraphCurve(spark, sizes)
      spark.stop()
      return
    }
    if (regime == "clustered") {
      // the round-13 verdict's owed measurement: does cell routing hold
      // recall on data WITH cluster structure (vs the isotropic decay)?
      // Same pipelines, same sizes — only the corpus changes.
      clusteredVecs(spark, 1000).selectExpr("sum(element_at(embedding, 1))").collect()
      knnGraphCurve(spark, sizes, clusteredVecs)
      annCurve(spark, sizes,
        if (args.length > 2) args(2).split(",").map(_.trim).toSet
        else Set("ivfpq128_rr50", "ivf64_probe8"),
        clusteredVecs)
      spark.stop()
      return
    }
    if (regime == "silh") {
      clusteredVecs(spark, 1000).selectExpr("sum(element_at(embedding, 1))").collect()
      silhCurve(spark, sizes)
      spark.stop()
      return
    }
    if (regime == "mhfamily") {
      docs(spark, 1000, "adv").selectExpr("sum(length(text))").collect()
      // optional 3rd arg picks the corpora (default both degeneracy
      // regimes: adv = the 31-token collapse, real = wrap-anyway control)
      mhFamilyCurve(spark, sizes,
        if (args.length > 2) args(2).split(",").map(_.trim).toSeq
        else Seq("adv", "real"))
      spark.stop()
      return
    }
    if (regime == "kcore") {
      spark.read.format("graft-gen").option("rows", "1000").load()
        .agg(sum("id")).collect() // warm
      kcoreCurve(spark, sizes)
      spark.stop()
      return
    }
    if (regime == "snmrecall") {
      docs(spark, 1000, "adv").selectExpr("sum(length(text))").collect()
      // optional 3rd arg picks the corpus regime (default adv — where
      // the fixed width degenerates; heaps shows the derivation is a
      // no-op on natural statistics)
      snmRecall(spark, sizes, if (args.length > 2) args(2) else "adv")
      spark.stop()
      return
    }
    // warm the session so size-1 rows aren't charged JVM spin-up
    docs(spark, 1000, regime).selectExpr("sum(length(text))").collect()

    val all: Seq[(String, DataFrame => DataFrame)] = Seq(
      "minhash_lsh" -> ((d: DataFrame) =>
        graft.ops.LlmExt2.minhashLshPairs(d, threshold = 0.6)),
      "simhash_blocked" -> simhashBlocked _,
      "incremental" -> incremental _,
      "prefix_filter" -> prefixFilter _,
      "snm_w8" -> ((d: DataFrame) => snmAt(d, 8)),
      "snm_derived" -> snmDerived _)
    // optional 3rd arg: csv of pipeline names to run (default all)
    val pipelines =
      if (args.length > 2) { val want = args(2).split(",").map(_.trim).toSet
        all.filter(p => want(p._1)) }
      else all
    println(f"${"pipeline"}%-16s ${"n_docs"}%8s ${"sec"}%8s ${"pairs"}%10s")
    for ((nm, f) <- pipelines; n <- sizes) {
      val d = docs(spark, n, regime).localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = f(d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$nm%-16s $n%8d $dt%8.2f $pairs%10d")
    }
    spark.stop()
  }
}

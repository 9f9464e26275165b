package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** q137's shape with the DECLARED test-scale 8-char block prefix —
    * measured as-is to show where the fixed constant stops scaling. */
  private def snm(d: DataFrame): DataFrame = {
    val t = d.select(col("doc_id"), col("lang"), col("text"),
      substring(col("text"), 1, 8).as("blk"),
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

  /** Deterministic synthetic vectors: id → 64 hash-arithmetic dims in
    * [-1, 1], any size regenerates bit-identically. */
  private def vecs(spark: SparkSession, n: Long): DataFrame =
    spark.read.format("graft-gen")
      .option("rows", n.toString).option("partitions", "32").load()
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          k => (pmod(xxhash64(col("id") * lit(2654435761L) + k.cast("long")),
            lit(2001L)) - 1000L).cast("double") / 1000.0).as("embedding"))

  /** ANN regime: measure brute-force / LSH-bucketed / IVF top-5 search for
    * Q=100 queries as the corpus grows, plus each approximate method's
    * recall@5 against the brute answer AT THAT SIZE (recall is the claim
    * the bucketed plans trade time for — a curve without it would hide
    * degenerating answers). Shapes are q41/q52/q62's production forms:
    * broadcast query side, bucket/list equi-joins, no all-pairs. */
  private def annCurve(spark: SparkSession, sizes: Seq[Long]): Unit = {
    import graft.plans.DotProduct.{dot => dotC, norm2 => n2C}
    val K = 5
    println(f"${"pipeline"}%-16s ${"n_vecs"}%8s ${"sec"}%8s ${"rows"}%10s ${"recall@5"}%9s")
    for (n <- sizes) {
      val emb = vecs(spark, n)
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
    }
  }

  def main(args: Array[String]): Unit = {
    val regime = args.headOption.getOrElse("real")
    val sizes = (if (args.length > 1) args(1) else regime match {
      case "adv" => "5000,10000,20000"
      case "ann" => "5000,50000,250000"
      case _     => "5000,50000,250000"
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
      annCurve(spark, sizes)
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
      "snm_w8" -> snm _)
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

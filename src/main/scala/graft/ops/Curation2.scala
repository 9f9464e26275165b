package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 operators (q79+): the scale-path decontamination (bloom
  * pre-filter + exact verify), repetition-based quality filtering,
  * token-budget selection, and the bucketed interval join — the shapes a
  * pretraining pipeline runs between ingest and packing.
  *
  * Determinism contract (CLAUDE.md): integer outputs CAST to BIGINT in
  * the DuckDB oracles (SUM/COUNT promote to HUGEINT); per-doc ratios are
  * raw int/int IEEE double quotients (identical in both engines); no
  * rounding of double quotients anywhere.
  */
object Curation2 {
  import Tables._

  /** Distinct token trigrams per doc — the q73 carve, shared by the exact
    * (q73) and bloom-prefiltered (q79) decontamination paths. Docs under 3
    * tokens are excluded on BOTH engines (Spark's sequence(1, n) runs
    * descending for n < 1 where DuckDB's generate_series comes back
    * empty). */
  private[graft] def trigrams(df: DataFrame): DataFrame = df
    .withColumn("toks", split(col("text"), " "))
    .where(size(col("toks")) >= 3)
    .select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => concat_ws(" ",
          element_at(col("toks"), i),
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2))))).as("g"))

  /** All (us_a < us_b, gap <= wMicros) same-key pairs of `ev` —
    * (key, us) rows, key column named user_id — WITHOUT an inequality
    * nested-loop join: each left row explodes into its two covering
    * width-W buckets (us DIV W and +1), the join is an equi-join on
    * (user_id, bucket) and the band predicate is a residual filter. A
    * qualifying pair's right bucket equals exactly one of the left's two
    * exploded buckets, so every pair matches exactly once.
    * PropertySpec checks the exactly-once claim against a naive
    * all-pairs ground truth on arbitrary inputs; PlanShapeSpec asserts
    * the declared q82 plan contains no nested-loop/cartesian join.
    *
    * Precondition: `us >= 0` (post-epoch). Spark's `DIV` truncates toward
    * zero, so the two-bucket cover argument would break for negative
    * timestamps (floor != truncate there); a pre-1970 corpus would need
    * `floor(us / W)` instead. */
  private[graft] def intervalSelfJoinPairs(ev: DataFrame, wMicros: Long): DataFrame = {
    val withB = ev.withColumn("b", expr(s"us DIV $wMicros"))
    val left = withB.select(col("user_id"), col("us").as("us_a"),
      explode(array(col("b"), col("b") + 1)).as("bk"))
    val right = withB.select(col("user_id"), col("us").as("us_b"), col("b").as("bk"))
    left.join(right, Seq("user_id", "bk"))
      .where(col("us_b") > col("us_a") && col("us_b") - col("us_a") <= wMicros)
      .select("user_id", "us_a", "us_b")
  }

  val defs: Vector[(String, QDef)] = Vector(

    // ---------------------------------------------------------------- q79
    // Bloom-prefiltered decontamination — the 100 TB form of q73. q73
    // broadcasts the benchmark GRAM TABLE into a hash join; at real
    // benchmark sizes (10^8-10^9 grams) that table no longer broadcasts,
    // but its BLOOM FILTER does (~1.2 bits/gram/10x-FP) — so the corpus
    // side is pre-filtered by graft_might_contain against a
    // scalar-subquery graft_bloom_agg (Spark's own runtime-filter
    // expression pair, registered in GraftExtensions), and only the
    // surviving ~FP+match fraction reaches the exact gram equi-join.
    // False positives die in the join, false negatives are impossible, so
    // the result is EXACT — the oracle replays plain exact decontamination
    // with no bloom at all. Output is the training-side drop list: every
    // train doc sharing >=2 distinct trigrams with any benchmark doc.
    "q79_bloom_decontaminate" -> QDef(
      (s, d) => {
        val docs = documents(s, d)
        trigrams(docs.where(col("doc_id") % 97 === 0))
          .withColumnRenamed("doc_id", "bench_id")
          .createOrReplaceTempView("q79_bench")
        trigrams(docs.where(col("doc_id") % 97 =!= 0))
          .createOrReplaceTempView("q79_train")
        s.sql("""
          WITH cand AS (
            SELECT doc_id, g FROM q79_train
            WHERE graft_might_contain(
              (SELECT graft_bloom_agg(xxhash64(g), 100000L, 800000L) FROM q79_bench),
              xxhash64(g))),
          hits AS (
            SELECT cand.doc_id, b.bench_id, COUNT(*) AS n_shared
            FROM cand JOIN q79_bench b ON cand.g = b.g
            GROUP BY 1, 2 HAVING COUNT(*) >= 2)
          SELECT doc_id, COUNT(*) AS n_bench, SUM(n_shared) AS n_shared_total
          FROM hits GROUP BY doc_id ORDER BY doc_id""")
      },
      """WITH g AS (
        |  SELECT DISTINCT doc_id,
        |         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
        |          unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
        |        FROM documents) t),
        |bench AS (SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 97 = 0),
        |train AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0),
        |hits AS (
        |  SELECT t.doc_id, bench_id, COUNT(*) AS n_shared
        |  FROM train t JOIN bench USING (g)
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench,
        |       CAST(SUM(n_shared) AS BIGINT) AS n_shared_total
        |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ),

    // ---------------------------------------------------------------- q80
    // Within-document repetition filter (the Gopher-style quality signal
    // q50's surface ratios can't see): the fraction of duplicate token
    // 2-grams and 3-grams per document. A doc that loops the same phrase
    // has high dup fractions at normal length/stopword ratios — exactly
    // the failure mode that survives q50. Pure per-row projection + one
    // aggregation-free filter: n-gram lists are per-row HOF arrays (each
    // staged once — no re-evaluation, see LlmExt2.minhashArr), dup counts
    // are size - size(array_distinct), fractions are raw int/int IEEE
    // quotients (never rounded, per the determinism contract). No shuffle
    // except the output sort. Thresholds flag ~13% of this corpus at
    // every SF (tuned empirically; real pipelines tune on holdout docs).
    //
    // The per-doc stats frame is MATERIALIZED (localCheckpoint) before the
    // threshold filter: predicate pushdown substitutes aliases, so a
    // filter over the projected fractions re-inlines the whole n-gram
    // construction (split(text) 12x) into one giant condition whose
    // per-fresh-plan compile/eval setup cost was ~4s at sf0.01 — 50x the
    // actual scan. Checkpointing the ~9-column stats table is also what a
    // scoring pipeline ships anyway; the filter then runs on plain
    // attributes.
    "q80_repetition_filter" -> QDef(
      (s, d) =>
        documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .where(size(col("toks")) >= 3)
          .withColumn("bi", transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .withColumn("tri", transform(
            sequence(lit(1), size(col("toks")) - 2),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
          .select(
            col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_toks"),
            size(col("bi")).cast("long").as("n_bi"),
            (size(col("bi")) - size(array_distinct(col("bi")))).cast("long").as("dup2"),
            size(col("tri")).cast("long").as("n_tri"),
            (size(col("tri")) - size(array_distinct(col("tri")))).cast("long").as("dup3"))
          .localCheckpoint()
          .withColumn("frac2", col("dup2") / col("n_bi"))
          .withColumn("frac3", col("dup3") / col("n_tri"))
          .where(col("frac2") >= 0.06 || col("frac3") >= 0.02)
          .orderBy("doc_id"),
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
        |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |bi AS (SELECT doc_id, COUNT(*) AS n_bi, COUNT(*) - COUNT(DISTINCT g) AS dup2
        |       FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |             FROM (SELECT doc_id, toks,
        |                     unnest(generate_series(1, len(toks)-1)) AS i FROM t) x) y
        |       GROUP BY doc_id),
        |tri AS (SELECT doc_id, COUNT(*) AS n_tri, COUNT(*) - COUNT(DISTINCT g) AS dup3
        |       FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        |             FROM (SELECT doc_id, toks,
        |                     unnest(generate_series(1, len(toks)-2)) AS i FROM t) x) y
        |       GROUP BY doc_id)
        |SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_toks,
        |       CAST(n_bi AS BIGINT) AS n_bi, CAST(dup2 AS BIGINT) AS dup2,
        |       CAST(n_tri AS BIGINT) AS n_tri, CAST(dup3 AS BIGINT) AS dup3,
        |       dup2 / n_bi AS frac2, dup3 / n_tri AS frac3
        |FROM t JOIN bi USING (doc_id) JOIN tri USING (doc_id)
        |WHERE dup2 / n_bi >= 0.06 OR dup3 / n_tri >= 0.02
        |ORDER BY doc_id""".stripMargin
    ),

    // ---------------------------------------------------------------- q81
    // Token-budget selection: per language, take the highest-quality
    // documents (the q50/q78 quality formula — int/int IEEE quotients,
    // deterministic in both engines) until a fixed token budget is spent —
    // the "best N tokens per language" cut every mixture builder runs
    // after scoring. A doc is kept iff the tokens BEFORE it (exclusive
    // prefix sum in (quality DESC, doc_id) order) are under budget, so the
    // first doc to cross the line is still taken — budgets are floors, not
    // ceilings, and the verdict per doc is order-stable. ORACLE FORM: one
    // window per language partition; at 100 TB a language can exceed one
    // task, and the production path is the q71 two-pass range-bucketed
    // prefix sum (Scan.runningSumByRange) keyed by (lang, bucket).
    "q81_budget_pack" -> QDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
          .orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_toks", size(col("toks")).cast("long"))
          .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
          .withColumn("n_stop", size(filter(col("toks"),
            t => t.isin("a", "the", "row", "value", "table", "and", "of"))).cast("long"))
          .withColumn("quality",
            lit(0.5) * (col("n_distinct") / col("n_toks")) +
              lit(0.3) * (lit(1.0) - col("n_stop") / col("n_toks")) +
              lit(0.2) * (least(col("n_toks"), lit(100L)) / 100.0))
          .withColumn("prior_toks", coalesce(sum(col("n_toks")).over(w), lit(0L)))
          .where(col("prior_toks") < 2000L)
          .select("lang", "doc_id", "n_toks", "prior_toks", "quality")
          .orderBy("lang", "doc_id")
      },
      """WITH scored AS (
        |  SELECT lang, doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    0.5 * (CAST(len(list_distinct(toks)) AS BIGINT) / CAST(len(toks) AS BIGINT))
        |      + 0.3 * (1.0 - CAST(len(list_filter(toks,
        |            t -> t IN ('a','the','row','value','table','and','of'))) AS BIGINT)
        |          / CAST(len(toks) AS BIGINT))
        |      + 0.2 * (least(CAST(len(toks) AS BIGINT), 100) / 100.0) AS quality
        |  FROM (SELECT lang, doc_id, string_split(text, ' ') AS toks FROM documents) t),
        |cum AS (
        |  SELECT lang, doc_id, n_toks, quality,
        |    CAST(COALESCE(SUM(n_toks) OVER (
        |      PARTITION BY lang ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior_toks
        |  FROM scored)
        |SELECT lang, doc_id, n_toks, prior_toks, quality
        |FROM cum WHERE prior_toks < 2000
        |ORDER BY lang, doc_id""".stripMargin
    ),

    // ---------------------------------------------------------------- q82
    // Bucketed interval self-join: all event pairs by the same user within
    // 10 minutes (the batch twin of the s6 stream-stream interval join,
    // and the scale rewrite of a pure inequality join). A naive
    // `ON b.ts > a.ts AND b.ts - a.ts <= W` theta join has no equi key
    // and plans a nested-loop — quadratic per user. Instead each left row
    // is EXPLODED into its two covering 10-minute buckets (ts DIV W and
    // +1) and the join runs as an equi-join on (user_id, bucket) with the
    // interval predicate as a residual filter: every qualifying pair's
    // right bucket equals exactly one of the left's two, so pairs match
    // exactly once — 2x row expansion buys a hash join that shuffles
    // linearly at any scale. PlanShapeSpec asserts no nested-loop /
    // cartesian product survives in the plan. Gaps are exact long micros.
    "q82_interval_bucket_join" -> QDef(
      (s, d) => {
        val W = 600000000L // 10 minutes in microseconds
        intervalSelfJoinPairs(
          events(s, d).select(col("user_id"), unix_micros(col("ts")).as("us")), W)
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_pairs"),
            min(col("us_b") - col("us_a")).as("min_gap_us"),
            max(col("us_b") - col("us_a")).as("max_gap_us"))
          .orderBy("user_id")
      },
      """SELECT a.user_id, COUNT(*) AS n_pairs,
        |       MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS min_gap_us,
        |       MAX(epoch_us(b.ts) - epoch_us(a.ts)) AS max_gap_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND epoch_us(b.ts) > epoch_us(a.ts)
        |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin
    ),

    // ---------------------------------------------------------------- q83
    // LSH recall audit: the dedup-quality report a curation run ships
    // alongside its dedup pass. Ground truth = ALL same-lang pairs at
    // exact Jaccard >= 0.6 (the q40 all-pairs shape on its doc_id % 7
    // carve — all-pairs cost is quadratic in the carve, so the audit
    // samples 1/7, not q46's 1/3); candidates = the q46 band equi-join (same hash
    // family, same dictionary ids). One row: exact pair count, candidate
    // count, hits, recall, and candidate precision (raw long/long quotients). On this
    // corpus s≈0.6 pairs collide with prob 1-(1-s^4)^4 ≈ 0.43, so the
    // audit's job — telling you the band config's real recall so you can
    // add bands/rows — has signal. The ground-truth side is the sampled
    // oracle twin; at 100 TB recall is estimated on exactly such a carve
    // (all-pairs on the full corpus is the thing LSH exists to avoid).
    "q83_lsh_recall" -> QDef(
      (s, d) => {
        val docsT = documents(s, d).where(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("lang"),
            array_distinct(split(col("text"), " ")).as("toks"))
          .withColumn("sz", size(col("toks")).cast("long"))
          .localCheckpoint() // feeds both sides of the all-pairs join
        // 32-way spread of the probe side: the checkpointed doc table is
        // byte-small (one partition after AQE; the build side broadcasts),
        // so the ~50k-pair array_intersect verify would otherwise run in
        // one task (q97 lesson — row-heavy, byte-light).
        val exact = docsT.repartition(32).as("a")
          .join(docsT.as("b"),
            col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
            size(array_intersect(col("a.toks"), col("b.toks"))).cast("long").as("n_common"))
          .withColumn("jaccard",
            col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
          .where(col("jaccard") >= 0.6)
          .select("doc_a", "doc_b")
          .localCheckpoint() // feeds n_exact and the hit semi-join
        val toks = docsT.select(col("doc_id"), col("lang"),
          explode(col("toks")).as("tok"))
        val tokIds = toks.join(LlmExt2.tokenDict(toks), "tok")
          .groupBy("doc_id", "lang")
          .agg(collect_list(col("tid").cast("long")).as("ids"))
        val sig = LlmExt2.explodeBandSigs(tokIds)
        val cand = sig.as("x")
          .join(sig.as("y"), col("x.band") === col("y.band") &&
            col("x.sig") === col("y.sig") && col("x.lang") === col("y.lang") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
          .localCheckpoint() // feeds n_cand and the hit semi-join
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .crossJoin(exact.join(cand, Seq("doc_a", "doc_b"), "left_semi")
            .agg(count(lit(1)).as("n_hit")))
          .withColumn("recall", col("n_hit") / col("n_exact"))
          .withColumn("cand_precision", col("n_hit") / col("n_cand"))
      },
      s"""WITH d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 7 = 0),
        |toks AS (SELECT DISTINCT doc_id, lang, tok FROM
        |  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM d) t),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |          FROM toks a JOIN toks b
        |            ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |exact AS (SELECT doc_a, doc_b FROM inter
        |          JOIN sizes sa ON sa.doc_id = doc_a
        |          JOIN sizes sb ON sb.doc_id = doc_b
        |          WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.6),
        |dict AS (SELECT tok, dense_rank() OVER (ORDER BY tok) AS tid
        |         FROM (SELECT DISTINCT tok FROM toks) u),
        |tid AS (SELECT doc_id, lang, tid FROM toks JOIN dict USING (tok)),
        |mh AS (SELECT doc_id, lang, i, MIN((h.mult*tid + (7*i+5)) % 104729) AS mh
        |       FROM tid CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i,
        |                    unnest([${LlmExt2.mhMultsSql}]) AS mult) h
        |       GROUP BY doc_id, lang, i),
        |sig AS (SELECT doc_id, lang, CAST(i // 4 AS BIGINT) AS band,
        |          CAST(SUM(mh * CASE WHEN i % 4 = 0 THEN 1 WHEN i % 4 = 1 THEN 131
        |                             WHEN i % 4 = 2 THEN 17161 ELSE 2248091 END) AS BIGINT) AS sig
        |        FROM mh GROUP BY 1, 2, 3),
        |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |         FROM sig x JOIN sig y ON x.band = y.band AND x.sig = y.sig
        |           AND x.lang = y.lang AND x.doc_id < y.doc_id)
        |SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
        |       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand,
        |       CAST((SELECT COUNT(*) FROM exact e JOIN cand c USING (doc_a, doc_b)) AS BIGINT) AS n_hit,
        |       CAST((SELECT COUNT(*) FROM exact e JOIN cand c USING (doc_a, doc_b)) AS BIGINT)
        |         / CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS recall,
        |       CAST((SELECT COUNT(*) FROM exact e JOIN cand c USING (doc_a, doc_b)) AS BIGINT)
        |         / CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS cand_precision""".stripMargin
    ),

    // ---------------------------------------------------------------- q84
    // The custom DataSource V2 under the gate: read 100k rows from the
    // `graft-gen` generator source (sources/GraftGenSource — full DSv2
    // with range-partitioned parallel read, column pruning, and
    // filter-driven partition pruning), aggregate per lang. The id-range
    // predicate is pushed into the source and prunes whole partitions
    // (GenSourceSpec asserts it); doubles are only MIN/MAXed (order-free,
    // no double-sum nondeterminism). The oracle REGENERATES the source's
    // rows with generate_series + the same integer arithmetic — the
    // source's generator contract itself is what the hash gate checks.
    // sfDir is deliberately unused: the source is its own data.
    "q84_gen_source" -> QDef(
      (s, _) =>
        s.read.format("graft-gen")
          .option("rows", "100000").option("partitions", "8").load()
          .where(col("id") >= 20000L && col("id") < 90000L)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_toks")).as("sum_toks"),
            min(col("score")).as("min_score"),
            max(col("score")).as("max_score"))
          .orderBy("lang"),
      """WITH g AS (
        |  SELECT id,
        |         ['en','de','fr','es','zh'][CAST(id % 5 AS INT) + 1] AS lang,
        |         20 + (id * 37) % 300 AS n_toks,
        |         (id % 97) / CAST(97 AS DOUBLE) AS score
        |  FROM (SELECT unnest(generate_series(0, 99999)) AS id) t
        |  WHERE id >= 20000 AND id < 90000)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
        |       MIN(score) AS min_score, MAX(score) AS max_score
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q107
    // Weighted systematic sampling by token budget: shuffle the corpus
    // with the deterministic 7919/104729 permutation (q71's order), lay
    // token counts end-to-end, and keep every document whose token span
    // (offset, offset + n_tok] crosses a 512-token stride boundary —
    // inclusion probability proportional to size WITHOUT floating-point
    // priorities (A-ES needs pow/log, which is libm territory; this is
    // pure int64). This is the data-mixing sampler a training pipeline
    // runs to hit a token budget with size-proportional coverage. The
    // offsets come from the two-pass range-bucketed scan
    // (Scan.runningSumByRange) — one partitioned window + a P-row carry +
    // a broadcast join; no global sort at any scale.
    "q107_systematic_sample" -> QDef(
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .withColumn("perm", (col("doc_id") * 7919) % 104729)
        Scan.runningSumByRange(
            docs, col("perm"), col("doc_id"), col("n_tok"),
            "offset", lo = 0L, hi = 104729L)
          .where(expr("(offset + n_tok) DIV 512") > expr("offset DIV 512"))
          .select("doc_id", "n_tok", "offset")
          .orderBy("doc_id")
      },
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         (doc_id * 7919) % 104729 AS perm
        |  FROM documents),
        |o AS (SELECT doc_id, n_tok,
        |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY perm, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS "offset"
        |      FROM t)
        |SELECT doc_id, n_tok, "offset" FROM o
        |WHERE ("offset" + n_tok) // 512 > "offset" // 512
        |ORDER BY doc_id""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Declared queries that put the SCALE paths under the driver's DuckDB
  * oracle gate (SURVEY.md §2.2). Rounds 1–3 built production variants of
  * the two known single-partition/broadcast weak spots (IVF ANN in
  * [[Ann]], the distributed prefix-scan in [[Scan]]) but only spec-tested
  * them; these entries make the driver hash-check the scale forms
  * themselves, so "the scale path is bit-identical" is driver-visible,
  * not just an `sbt test` claim.
  *
  * Reference provenance: reference checkout is empty (SURVEY.md §0);
  * these extend the reconstructed surface per the task brief's
  * LLM-pipeline mandate.
  */
object ScaleQueries {

  val defs: Vector[(String, QDef)] = Vector(

    // IVF ANN probing EVERY list (nprobe == nlist): provably identical to
    // brute-force cosine top-k (AnnIvfSpec locks it bit-for-bit), so the
    // DuckDB brute-force SQL is an EXACT oracle for the whole k-means
    // index → probe → per-list rank pipeline. Runs the large-Q
    // shuffle-join variant so the no-broadcast scale form is what gets
    // hash-checked; partial-probe (nprobe << nlist) is the production
    // recall knob, bounded in AnnIvfSpec instead (no SQL analog exists).
    "q62_ivf_ann" -> QDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val (index, centroids) =
          Ann.ivfIndex(emb.select(col("vec_id"), col("embedding")), nlist = 16)
        val queries = emb
          .where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        Ann.ivfTopKLargeQ(index, centroids, queries, k = 5, nprobe = 16)
          .select(col("qid"), col("vec_id").as("vid"), col("cos_sim"), col("rnk"))
          .orderBy("qid", "rnk")
      },
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |a AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |p AS (SELECT qid, vid,
        |        list_aggregate(list_transform(list_zip(qe, ve), x -> x[1]*x[2]), 'sum')
        |          / sqrt(list_aggregate(list_transform(qe, x -> x*x), 'sum')
        |                 * list_aggregate(list_transform(ve, x -> x*x), 'sum')) AS cos_sim
        |      FROM q, a WHERE vid <> qid),
        |r AS (SELECT qid, vid, cos_sim,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vid) AS INT) AS rnk
        |      FROM p)
        |SELECT qid, vid, cos_sim, rnk FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    ),

    // q37's late-event classification with the running watermark computed
    // by the distributed two-pass prefix-scan (range-bucket → parallel
    // per-bucket running max → P-row carry prefix → broadcast rejoin)
    // instead of q37's single-partition global window. Same oracle SQL as
    // q37 — the point is that the scale-safe plan reproduces the global
    // fold exactly (ScanSpec proves bit-equality; this makes the driver
    // prove it against DuckDB too).
    "q63_late_events_scan" -> QDef(
      (s, d) => Scan.lateEventsScalable(Tables.events(s, d)),
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  COUNT(*) AS n_total
        |FROM (
        |  SELECT event_type,
        |    ts < max(ts) OVER (ORDER BY (event_id * 7919) % 104729, event_id
        |                       ROWS UNBOUNDED PRECEDING) - INTERVAL 10 MINUTE AS is_late
        |  FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin
    ),

    // The native AS-OF JOIN operator (graft.plans.AsOfJoin — custom
    // LogicalPlan + SparkStrategy + merge-pass SparkPlan, extension tier
    // (c)): each purchase picks up the latest STRICTLY-earlier click of
    // the same user. Same semantics as q16, whose window form only works
    // because both sides are carved from ONE table; the operator handles
    // arbitrary two-table input with one co-partitioned sort-merge pass.
    // Oracle = q16's SQL — the custom operator must reproduce the
    // relational spelling exactly.
    "q64_asof_native" -> QDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.plans.AsOfJoin.asof(
          left = ev.where(col("event_type") === "purchase"),
          right = ev.where(col("event_type") === "click"),
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("ts" -> "last_click_ts"))
          .select("event_id", "user_id", "ts", "last_click_ts")
          .orderBy("event_id")
      },
      """SELECT p.event_id, p.user_id, p.ts, MAX(c.ts) AS last_click_ts
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin
    ),

    // Character 4-gram Jaccard near-dup — the n-gram (shingle) layer of
    // the dedup family: q40 is token-set Jaccard, q51 is token-3-gram
    // fingerprints, this is raw character shingles (robust to
    // tokenization differences; the classic Broder shingling unit).
    // Sampled inverted-index join like q40 (same corpus-density caveat);
    // the unsampled scale path is minhashLshPairs over shingle sets —
    // identical join shape, hashed ids.
    "q65_char_ngram_jaccard" -> QDef(
      (s, d) => {
        val grams = Tables.documents(s, d)
          .where(col("doc_id") % 7 === 0 && length(col("text")) >= 4)
          .select(col("doc_id"), col("lang"),
            explode(array_distinct(transform(
              sequence(lit(1), length(col("text")) - 3),
              i => col("text").substr(i, lit(4))))).as("g"))
          // Materialize the gram table once: its three consumers (both
          // self-join sides and the per-doc sizes) only share an exchange
          // for the join sides — the sizes aggregate shuffles on a
          // different key and would re-run the HOF gram build otherwise.
          .localCheckpoint()
        val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        grams.as("a")
          .join(grams.as("b"),
            col("a.g") === col("b.g") && col("a.lang") === col("b.lang") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_common"))
          .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
          .withColumn("jaccard",
            col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
          // char-gram overlap runs lower than token overlap on this corpus
          // (max ~0.42 at sf0.01): 0.35 ≈ the top decile — non-vacuous at
          // every SF, still selective
          .where(col("jaccard") >= 0.35)
          .select("doc_a", "doc_b", "n_common", "jaccard")
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(50)
      },
      """WITH d AS (SELECT doc_id, lang, text FROM documents
        |           WHERE doc_id % 7 = 0 AND length(text) >= 4),
        |grams AS (SELECT DISTINCT doc_id, lang, substr(text, CAST(i AS INT), 4) AS g
        |          FROM (SELECT doc_id, lang, text,
        |                  unnest(generate_series(1, length(text) - 3)) AS i
        |                FROM d) t),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |          FROM grams a JOIN grams b
        |            ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |       n_common / (sa.sz + sb.sz - n_common) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = doc_a
        |           JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.35
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin
    ),

    // Connected-components dup clustering (graft.ops.Dedup) under the
    // oracle gate. Edges are CONSECUTIVE doc_ids among the first 3 docs of
    // each (lang, source) group — a CHAIN, not a clique — so min-label
    // propagation must walk 2 hops (a real transitive-closure instance:
    // the tail node shares no edge with the head) while staying cheap in
    // the bench: every iteration is two driver actions of ~1 s fixed
    // overhead, so the chain cap prices the query (pointer jumping makes
    // rounds O(log chain), but fewer rounds is still cheaper). Ground truth
    // is SQL-expressible: every chain node's component minimum is its
    // group's minimum doc_id. (The corpus has no exact-text duplicates at
    // the gate SFs, so the grouping key is (lang, source), not text.)
    "q66_dup_clusters" -> QDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "source").orderBy("doc_id")
        val chain = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .withColumn("prev", lag("doc_id", 1).over(w))
          .where(col("prev").isNotNull)
          .select(col("prev").as("doc_a"), col("doc_id").as("doc_b"))
        Dedup.dupClusters(chain)
          .select(col("node").as("doc_id"), col("label").as("canonical_id"))
          .orderBy("doc_id")
      },
      """WITH r AS (SELECT doc_id, lang, source,
        |             row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |           FROM documents),
        |k AS (SELECT doc_id, lang, source FROM r WHERE rn <= 3),
        |g AS (SELECT doc_id,
        |        COUNT(*)    OVER (PARTITION BY lang, source) AS n,
        |        MIN(doc_id) OVER (PARTITION BY lang, source) AS canonical_id
        |      FROM k)
        |SELECT doc_id, canonical_id FROM g WHERE n >= 2 ORDER BY doc_id""".stripMargin
    ),

    // The `asof_join` SQL table-valued function (injectTableFunction —
    // plans/AsOfJoin.AsOfJoinTvf): the FROM-clause surface over the same
    // native AsOfJoinPlan as q64, exercised end-to-end from SQL text. The
    // oracle is DuckDB's own native ASOF LEFT JOIN — two independent
    // engines' first-class as-of operators must agree row-for-row (and
    // both must agree with q64's relational MAX-rejoin spelling).
    "q68_asof_sql" -> QDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.where(col("event_type") === "purchase")
          .createOrReplaceTempView("graft_q68_purchases")
        ev.where(col("event_type") === "click")
          .createOrReplaceTempView("graft_q68_clicks")
        s.sql("""SELECT event_id, user_id, ts, last_click_ts
                |FROM asof_join('graft_q68_purchases', 'graft_q68_clicks',
                |               'user_id', 'user_id', 'ts', 'ts',
                |               'ts', 'last_click_ts')
                |ORDER BY event_id""".stripMargin)
      },
      """SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts > c.ts
        |ORDER BY p.event_id""".stripMargin
    ),

    // Salted two-phase aggregation (graft.ops.Skew) under the gate:
    // l_returnflag is a 3-value key — exactly the hot-key shape where one
    // reducer eats the table — salted 16 ways on (l_orderkey, l_partkey)
    // for the partial phase, then combined. The DECIMAL(18,4) sum bridge
    // makes the salted re-aggregation provably bit-identical to the plain
    // single-phase plan, so the ORACLE IS the plain GROUP BY.
    "q67_salted_agg" -> QDef(
      (s, d) =>
        Skew.saltedCountSum(
          Tables.lineitem(s, d), keyCol = "l_returnflag",
          valueCol = "l_extendedprice",
          saltCols = Seq("l_orderkey", "l_partkey"))
          .orderBy("l_returnflag"),
      s"""SELECT l_returnflag,
         |  COUNT(*) AS n_rows,
         |  ${graft.Det.sqlDsum("l_extendedprice")} AS sum_value
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  )
}

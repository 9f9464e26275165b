package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 15: training-set assembly correctness — a
  * dedup-cluster-aware train/test fold split with a leakage audit (q207)
  * and an integer-arithmetic curriculum difficulty manifest (q208).
  *
  * q207 closes the gap between the dedup family (q39–q66) and the split
  * family (q183 manifests, q69/q107 sampling): hashing DOCUMENTS into
  * folds leaks near-duplicate content across the train/eval boundary —
  * the split unit must be the duplicate CLUSTER. q208 is the pacing
  * artifact a curriculum schedule reads: per difficulty bucket, the doc
  * and token budget with a cumulative schedule column.
  *
  * Determinism: fold assignment and cluster keys go through the portable
  * md5-hex→int64 hash (the q204 bridge); difficulty is EXACT int64
  * arithmetic end-to-end (rarity = N − df, score = a ppm integer
  * division) — no doubles anywhere a bucket or fold decision is made.
  */
object Round10o {
  import Tables._

  /** Portable per-engine-identical hash of a string column into [0, m). */
  private def foldOf(c: org.apache.spark.sql.Column, m: Int) =
    conv(substring(md5(concat(c, lit("#fold"))), 1, 15), 16, 10)
      .cast("long") % m

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q207
    // Cluster-aware fold split + leakage audit. Cluster key = md5 of the
    // doc's SORTED DISTINCT token set (on this 31-token corpus a real
    // consolidation: 5000 docs → 3935 clusters, max 248 docs; at 100 TB
    // the same role is played by a minhash-band or q66 CC key — any
    // per-doc cluster attribute slots in unchanged). Every doc in a
    // cluster gets fold = hash(cluster key) % 5, so no cluster can span
    // folds BY CONSTRUCTION; the audit quantifies what naive per-doc
    // hashing (fold = hash(doc_id) % 5) would have leaked: docs whose
    // cluster straddles ≥2 naive folds. Scale shape: one map-side
    // projection to (ck, nf), one groupBy on the cluster key (the
    // natural shuffle), a ck-equi-join back, and two ≤5-row fold
    // rollups joined on fold.
    "q207_fold_leakage" -> QDef(
      (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("n_chars"),
          md5(array_join(array_sort(array_distinct(split(col("text"), " "))),
            "|")).as("ck"),
          foldOf(col("doc_id").cast("string"), 5).as("nf"))
        val cl = base.groupBy("ck")
          .agg(countDistinct("nf").as("n_naive_folds"))
          .withColumn("cf", foldOf(col("ck"), 5))
        val docs = base.join(cl, "ck")
        val aware = docs.groupBy(col("cf").as("fold"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("ck").as("n_clusters"),
            sum("n_chars").as("tot_chars"))
        val naive = docs.groupBy(col("nf").as("fold"))
          .agg(count(lit(1)).as("n_docs_naive"),
            sum(when(col("n_naive_folds") > 1, 1L).otherwise(0L))
              .as("n_leaked_docs_naive"))
        aware.join(naive, Seq("fold")).orderBy("fold")
      },
      """WITH base AS (
        |  SELECT doc_id, n_chars,
        |         md5(list_aggregate(list_sort(list_distinct(
        |           string_split(text, ' '))), 'string_agg', '|')) AS ck,
        |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
        |           || '#fold'), 1, 15)) AS BIGINT) % 5 AS nf
        |  FROM documents),
        |cl AS (
        |  SELECT ck, COUNT(DISTINCT nf) AS n_naive_folds,
        |         CAST(('0x' || substring(md5(ck || '#fold'), 1, 15))
        |           AS BIGINT) % 5 AS cf
        |  FROM base GROUP BY ck),
        |docs AS (SELECT * FROM base JOIN cl USING (ck)),
        |aware AS (
        |  SELECT cf AS fold, COUNT(*) AS n_docs,
        |         COUNT(DISTINCT ck) AS n_clusters,
        |         CAST(SUM(n_chars) AS BIGINT) AS tot_chars
        |  FROM docs GROUP BY 1),
        |naive AS (
        |  SELECT nf AS fold, COUNT(*) AS n_docs_naive,
        |         CAST(SUM(CASE WHEN n_naive_folds > 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_leaked_docs_naive
        |  FROM docs GROUP BY 1)
        |SELECT fold, n_docs, n_clusters, tot_chars, n_docs_naive,
        |       n_leaked_docs_naive
        |FROM aware JOIN naive USING (fold) ORDER BY fold""".stripMargin
    ),

    // --------------------------------------------------------------- q208
    // Curriculum difficulty manifest. Per-doc difficulty = Σ over token
    // OCCURRENCES of the rarity weight (N − df(token)) — algebraically
    // N·n_toks − Σ df, so the doc grain needs only (n_toks, Σ df) plus
    // the corpus size. score_ppm = ⌊1e6 · difficulty / (n_toks·(N−1))⌋
    // normalizes to [0, 1e6] at ANY corpus size (rarest possible token
    // has df=1 ⇒ weight N−1), buckets are 1%-wide ⇒ AT MOST 101 manifest
    // rows (7–9 occupied on this corpus), and the cumulative token budget — the column a pacing
    // schedule actually consumes — is a global running sum over that
    // fixed-domain-bounded table (PlanAudit-whitelisted, the q105/q150
    // argument). Scale shape: token explode is map-side; df is a
    // vocabulary-sized rollup broadcast back (31 rows here; any real
    // vocab ≪ corpus); the doc rollup is one (doc_id) shuffle; the
    // 1-row corpus count rides a grouping-free broadcast (NLJ-bounded).
    // All arithmetic exact int64: N·n_toks ≤ 2.5e6 at sf0.1, ×1e6 well
    // under 2^63; integer DIV is floor-identical in both engines on
    // nonnegative operands.
    "q208_curriculum" -> QDef(
      (s, d) => {
        val doc = documents(s, d)
        val tok = doc.select(col("doc_id"),
          explode(split(col("text"), " ")).as("t"))
        val dfT = tok.distinct().groupBy("t").agg(count(lit(1)).as("df"))
        val nd = doc.agg(count(lit(1)).as("nd"))
        tok.join(broadcast(dfT), "t")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"), sum("df").as("s_df"))
          .crossJoin(broadcast(nd))
          .withColumn("score_ppm",
            expr("(1000000 * (nd * n_toks - s_df)) DIV (n_toks * (nd - 1))"))
          .withColumn("bucket", expr("score_ppm DIV 10000"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("tot_tokens"),
            min("score_ppm").as("min_ppm"), max("score_ppm").as("max_ppm"))
          .withColumn("cum_tokens", sum("tot_tokens").over(
            Window.orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("bucket")
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |dfT AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t),
        |nd AS (SELECT COUNT(*) AS nd FROM documents),
        |per AS (
        |  SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM(df) AS BIGINT) AS s_df
        |  FROM tok JOIN dfT USING (t) GROUP BY doc_id),
        |sc AS (
        |  SELECT n_toks,
        |         (1000000 * (nd * n_toks - s_df)) // (n_toks * (nd - 1))
        |           AS score_ppm
        |  FROM per CROSS JOIN nd),
        |b AS (
        |  SELECT score_ppm // 10000 AS bucket, COUNT(*) AS n_docs,
        |         CAST(SUM(n_toks) AS BIGINT) AS tot_tokens,
        |         MIN(score_ppm) AS min_ppm, MAX(score_ppm) AS max_ppm
        |  FROM sc GROUP BY 1)
        |SELECT bucket, n_docs, tot_tokens, min_ppm, max_ppm,
        |       CAST(SUM(tot_tokens) OVER (ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_tokens
        |FROM b ORDER BY bucket""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 10: two batch-shaping / embedding-statistics operators a
  * training-data pipeline runs between curation and the trainer — the
  * fixed-shape-batch padding-waste audit (q191) and the distributed Gram
  * (second-moment) matrix over the embedding corpus (q192, the input to
  * whitening/PCA and the covariance complement of q161's per-label
  * centroids).
  *
  * Determinism: q191 is pure integer arithmetic until one identically-
  * spelled double quotient; q192 aggregates doubles ONLY through the
  * CLAUDE.md quantize bridge (FLOOR(x·1e6) → BIGINT — floor and the
  * power-of-ten multiply are identical IEEE ops in both engines, BIGINT
  * sums and products are exact and order-free), then divides back out in
  * one identically-spelled double expression.
  */
object Round10j {
  import Tables._

  /** q191's power-of-two bucket aggregation — (lang, cap) → exact
    * (n_docs, sum_tok, max_len). Shared with the s29 streaming
    * padding-waste monitor so the twins are the same logic by
    * construction; every column is sum/max-mergeable, which is what lets
    * the streaming side fold per-batch deltas into an exact snapshot. */
  private[graft] def padBucketCounts(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cap",
        when(col("n_tok") <= 16, 16)
          .when(col("n_tok") <= 32, 32)
          .when(col("n_tok") <= 64, 64)
          .otherwise(128))
      .groupBy("lang", "cap")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
        max("n_tok").as("max_len"))

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q191
    // Padding-waste audit for fixed-shape batching: docs are padded to
    // power-of-two token-length buckets (the standard fixed-shape batch
    // compiler contract), and the audit reports per (lang, bucket cap) the
    // doc count, real token mass, and the padding waste n·cap − Σtokens
    // the bucketing implies — the number a pipeline watches when choosing
    // bucket boundaries. Scale shape: one scan, a pure-expression CASE
    // ladder (NO range join — the 4-rung ladder is the whole bucket dim,
    // so there is nothing to broadcast), map-side-combinable groupBy on
    // (lang, cap) — cardinality ≤ langs × rungs regardless of corpus size.
    // The 16/32/64/128 rungs are test-scale constants pinned to the
    // corpus's 10–99 token range (the q151 convention); production derives
    // the ladder from the observed length histogram (q138's equi-depth
    // bins are the natural source).
    "q191_padding_waste" -> QDef(
      (s, d) => {
        padBucketCounts(documents(s, d))
          .withColumn("waste", col("cap") * col("n_docs") - col("sum_tok"))
          .select(col("lang"), col("cap"), col("n_docs"), col("sum_tok"),
            col("max_len"), col("waste"),
            (col("waste").cast("double") / (col("cap") * col("n_docs")))
              .as("pad_share"))
          .orderBy("lang", "cap")
      },
      """WITH t AS (
        |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT lang, n_tok,
        |         CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
        |              WHEN n_tok <= 64 THEN 64 ELSE 128 END AS cap
        |  FROM t),
        |g AS (
        |  SELECT lang, cap, COUNT(*) AS n_docs,
        |         CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
        |         CAST(MAX(n_tok) AS BIGINT) AS max_len
        |  FROM b GROUP BY 1, 2)
        |SELECT lang, cap, n_docs, sum_tok, max_len,
        |       cap * n_docs - sum_tok AS waste,
        |       CAST(cap * n_docs - sum_tok AS DOUBLE) / (cap * n_docs)
        |         AS pad_share
        |FROM g ORDER BY lang, cap""".stripMargin
    ),

    // --------------------------------------------------------------- q192
    // Distributed Gram (second-moment) matrix of the embedding corpus:
    // G[i,j] = Σ_rows x_i·x_j / n over the 64-dim vectors — the one-pass
    // sufficient statistic for whitening/PCA and the covariance
    // complement of q161's per-label centroids. Scale shape: a map-side
    // explode of the D(D+1)/2 = 2080 upper-triangle cells per row into a
    // groupBy whose cardinality is 2080 REGARDLESS of corpus size —
    // partial aggregation absorbs the fan-out before the shuffle, so the
    // exchange carries ≤ 2080 rows per map task at any scale (the
    // classic outer-product-sum layout; D² cells must fit a task, which
    // holds through D ~ 10⁴).
    // Determinism: x ∈ [−0.58, 0.58] ⇒ q = ⌊x·1e6⌋ ≤ 5.8e5 in magnitude,
    // q·q ≤ 3.4e11, and Σ over rows stays inside int64 through ~10⁷ rows
    // (5000× the tested corpus; beyond that shrink the quantum — the
    // q187 convention). qa is staged as a plain attribute before the
    // pair-generating HOF references it (the q46/q75 staging rule).
    "q192_embedding_gram" -> QDef(
      (s, d) => {
        val q = embeddings(s, d).select(
          expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
            .as("qa"))
        // The per-row fan-out is a FLAT long array (no per-cell (i,j)
        // structs — struct allocation ~doubled the hot-path cost, measured
        // 2.6 -> 1.5 s warm at sf0.1), keyed by the upper-triangle linear index
        // from posexplode; (i,j) are recovered on the 2080-row RESULT side
        // from constant-folded lookup arrays.
        val iOf = expr("element_at(flatten(transform(sequence(0, 63), i -> " +
          "transform(sequence(i, 63), j -> i))), pos + 1)")
        val jOf = expr("element_at(flatten(transform(sequence(0, 63), i -> " +
          "transform(sequence(i, 63), j -> j))), pos + 1)")
        q.select(posexplode(expr(
            """flatten(transform(sequence(0, 63), i ->
              |  transform(sequence(i, 63), j -> qa[i] * qa[j])))""".stripMargin))
            .as(Seq("pos", "prod")))
          .groupBy("pos")
          .agg(sum("prod").as("sp"), count(lit(1)).as("cnt"))
          .select(iOf.as("i"), jOf.as("j"),
            (col("sp").cast("double") / lit(1e12) / col("cnt")).as("gram"))
          .orderBy("i", "j")
      },
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qa
        |  FROM embeddings),
        |ii AS (SELECT unnest(generate_series(0, 63)) AS i),
        |pr AS (SELECT i, unnest(generate_series(i, 63)) AS j FROM ii),
        |ex AS (SELECT p.i, p.j, q.qa[p.i + 1] * q.qa[p.j + 1] AS prod
        |       FROM q CROSS JOIN pr p)
        |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |       CAST(CAST(SUM(prod) AS BIGINT) AS DOUBLE) / 1e12 / COUNT(*)
        |         AS gram
        |FROM ex GROUP BY 1, 2 ORDER BY i, j""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 fourth wave: set-containment join (conjunctive AND-search) and
  * multi-source survivorship (golden-record construction) — two operator
  * classes the inventory didn't yet exercise: subset-semantics joins and
  * per-field priority merge.
  *
  * Reference provenance: N/A (empty checkout, SURVEY.md §0).
  */
object Round9d {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q142
    // Set-containment join — the conjunctive AND-query of a search engine:
    // for each language, the 3 RAREST corpus tokens form a probe set, and
    // a document qualifies iff it contains ALL of them. Containment is
    // turned into counting: semi-join the token postings against the
    // broadcast probe set, count distinct matched terms per doc, keep
    // count == |probe|. Scale shape: the probe table is langs×3 rows
    // (broadcast); the postings join keeps only probe-term rows (the
    // inverted-index access path — selectivity is the whole point of
    // rare-term conjunctions); one map-side-combinable per-doc count. No
    // all-pairs, no array containment scan over the corpus.
    "q142_containment_join" -> QDef(
      (s, d) => {
        val tok = documents(s, d).select(
          col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        val freq = tok.groupBy("lang", "tok").agg(count(lit(1)).as("n"))
        val wr = Window.partitionBy("lang").orderBy(col("n"), col("tok"))
        val probe = freq.withColumn("rk", row_number().over(wr))
          .where(col("rk") <= 3).select("lang", "tok")
        tok.join(broadcast(probe), Seq("lang", "tok"))
          .groupBy("lang", "doc_id")
          .agg(countDistinct("tok").as("n_matched"))
          .where(col("n_matched") === 3)
          .select("lang", "doc_id")
          .orderBy("lang", "doc_id")
      },
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT lang, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
        |probe AS (SELECT lang, tok FROM (
        |  SELECT lang, tok, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n, tok) AS rk
        |  FROM freq) WHERE rk <= 3),
        |hits AS (
        |  SELECT t.lang, t.doc_id, COUNT(DISTINCT t.tok) AS n_matched
        |  FROM tok t JOIN probe p ON p.lang = t.lang AND p.tok = t.tok
        |  GROUP BY 1, 2)
        |SELECT lang, doc_id FROM hits WHERE n_matched = 3
        |ORDER BY lang, doc_id""".stripMargin
    ),

    // --------------------------------------------------------------- q143
    // Multi-source survivorship (golden record): the base customer table
    // (priority 1) merges with two deterministic update feeds — balance
    // updates for the %5 carve (priority 2, exact DECIMAL cents + 100)
    // and segment corrections for the %7 carve (priority 3) — and each
    // FIELD independently takes the highest-priority non-null value (the
    // MDM survivorship rule; q131 answers "value at time t", this answers
    // "the merged current truth"). Priorities are unique per (key,
    // source) by construction, so every arg_max is tie-free. Scale shape:
    // union of three scans, ONE map-side-combinable per-key aggregate —
    // the standard "golden record in one shuffle" plan; no join at all.
    "q143_golden_record" -> QDef(
      (s, d) => {
        val base = customer(s, d).select(col("c_custkey"),
          lit(1L).as("priority"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("mktsegment"), col("c_name").as("name"))
        val updBal = customer(s, d).where(col("c_custkey") % 5 === 0)
          .select(col("c_custkey"), lit(2L).as("priority"),
            (col("c_acctbal").cast(DecimalType(18, 2)) + 100).cast("double").as("acctbal"),
            lit(null).cast("string").as("mktsegment"),
            lit(null).cast("string").as("name"))
        val updSeg = customer(s, d).where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), lit(3L).as("priority"),
            lit(null).cast("double").as("acctbal"),
            lit("CORRECTED").as("mktsegment"),
            lit(null).cast("string").as("name"))
        base.unionAll(updBal).unionAll(updSeg)
          .groupBy("c_custkey")
          .agg(
            expr("max_by(acctbal, priority) FILTER (WHERE acctbal IS NOT NULL)")
              .as("g_acctbal"),
            expr("max_by(mktsegment, priority) FILTER (WHERE mktsegment IS NOT NULL)")
              .as("g_mktsegment"),
            expr("max_by(name, priority) FILTER (WHERE name IS NOT NULL)")
              .as("g_name"),
            count(lit(1)).as("n_sources"))
          .orderBy("c_custkey")
      },
      """WITH upd_bal AS (
        |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE) AS acctbal
        |  FROM customer WHERE c_custkey % 5 = 0),
        |upd_seg AS (
        |  SELECT c_custkey, 'CORRECTED' AS mktsegment FROM customer WHERE c_custkey % 7 = 0),
        |u AS (
        |  SELECT c_custkey, 1 AS priority, c_acctbal AS acctbal,
        |         c_mktsegment AS mktsegment, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 2, acctbal, NULL, NULL FROM upd_bal
        |  UNION ALL
        |  SELECT c_custkey, 3, NULL, mktsegment, NULL FROM upd_seg)
        |SELECT c_custkey,
        |       arg_max(acctbal, priority) FILTER (WHERE acctbal IS NOT NULL) AS g_acctbal,
        |       arg_max(mktsegment, priority) FILTER (WHERE mktsegment IS NOT NULL) AS g_mktsegment,
        |       arg_max(name, priority) FILTER (WHERE name IS NOT NULL) AS g_name,
        |       COUNT(*) AS n_sources
        |FROM u GROUP BY 1 ORDER BY c_custkey""".stripMargin
    ),

    // --------------------------------------------------------------- q144
    // Join-cardinality estimation audit — the CBO's histogram math made
    // inspectable: per hash-bucket of the join key, the uniformity
    // estimate of the self-join size (rows²/ndv — what an optimizer
    // computes from its statistics) against the EXACT size (Σ n_k²), with
    // q_err = est/actual quantifying how skew breaks the uniformity
    // assumption bucket by bucket. Scale shape: one per-key
    // pre-aggregate, then a 16-row rollup — the estimate costs exactly
    // what ANALYZE costs, never the join itself. All counts exact int64;
    // est and q_err are raw IEEE quotients with identical association on
    // both engines.
    "q144_cardest_audit" -> QDef(
      (s, d) => {
        val base = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
        base.withColumn("bucket", col("user_id") * 7919 % 104729 % 16)
          .groupBy("bucket")
          .agg(sum("n").as("n_rows"), count(lit(1)).as("ndv"),
            sum(col("n") * col("n")).as("actual_pairs"))
          .select(col("bucket"), col("n_rows"), col("ndv"),
            ((col("n_rows") * col("n_rows")).cast("double") /
              col("ndv").cast("double")).as("est_pairs"),
            col("actual_pairs"),
            (((col("n_rows") * col("n_rows")).cast("double") /
              col("ndv").cast("double")) /
              col("actual_pairs").cast("double")).as("q_err"))
          .orderBy("bucket")
      },
      """WITH base AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |b AS (SELECT user_id * 7919 % 104729 % 16 AS bucket, n FROM base)
        |SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS ndv,
        |       CAST(CAST(SUM(n) AS BIGINT) * CAST(SUM(n) AS BIGINT) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS est_pairs,
        |       CAST(SUM(n * n) AS BIGINT) AS actual_pairs,
        |       CAST(CAST(SUM(n) AS BIGINT) * CAST(SUM(n) AS BIGINT) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)
        |         / CAST(CAST(SUM(n * n) AS BIGINT) AS DOUBLE) AS q_err
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    ),

    // --------------------------------------------------------------- q145
    // CDC / MERGE-INTO apply: a deterministic changelog (deletes for the
    // %11 carve at seq 1, price updates for %13 at seq 2, key-shifted
    // inserts for %17 at seq 3) applies onto the orders base with
    // latest-op-wins per key — the batch form of every lakehouse MERGE /
    // CDC compaction job. Output is the post-merge per-(status,
    // disposition) reconciliation (kept/updated/inserted; deleted rows
    // excluded), money on the DECIMAL bridge. Scale shape: the changelog
    // dedups with a keyed window (per-key change lists, bounded by churn),
    // then ONE full-outer sort-merge join base⋈changelog and a tiny
    // rollup — no driver loop, no per-row apply.
    "q145_cdc_apply" -> QDef(
      (s, d) => {
        val base = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        val chg = orders(s, d).where(col("o_orderkey") % 11 === 0)
          .select(col("o_orderkey").as("k"), lit(1L).as("seq"), lit("D").as("op"),
            lit(null).cast("double").as("price"), lit(null).cast("string").as("status"))
          .unionAll(orders(s, d).where(col("o_orderkey") % 13 === 0)
            .select(col("o_orderkey").as("k"), lit(2L).as("seq"), lit("U").as("op"),
              (col("o_totalprice").cast(DecimalType(18, 2)) + 1).cast("double").as("price"),
              lit(null).cast("string").as("status")))
          .unionAll(orders(s, d).where(col("o_orderkey") % 17 === 0)
            .select((col("o_orderkey") + 10000000L).as("k"), lit(3L).as("seq"),
              lit("I").as("op"), col("o_totalprice").as("price"),
              col("o_orderstatus").as("status")))
        val wk = Window.partitionBy("k").orderBy(col("seq").desc)
        val latest = chg.withColumn("rn", row_number().over(wk))
          .where(col("rn") === 1).select("k", "op", "price", "status")
        base.join(latest, col("o_orderkey") === col("k"), "full_outer")
          .select(
            when(col("op").isNull, lit("kept"))
              .when(col("op") === "D", lit("deleted"))
              .when(col("op") === "U", lit("updated"))
              .otherwise(lit("inserted")).as("disposition"),
            when(col("op") === "U" || col("op") === "I", col("price"))
              .otherwise(col("o_totalprice")).as("price"),
            coalesce(col("o_orderstatus"), col("status")).as("status"))
          .where(col("disposition") =!= "deleted")
          .groupBy("status", "disposition")
          .agg(count(lit(1)).as("n"), graft.Det.dsum(col("price")).as("sum_price"))
          .orderBy("status", "disposition")
      },
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |chg AS (
        |  SELECT o_orderkey AS k, 1 AS seq, 'D' AS op,
        |         CAST(NULL AS DOUBLE) AS price, CAST(NULL AS VARCHAR) AS status
        |  FROM orders WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U',
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DOUBLE), NULL
        |  FROM orders WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 3, 'I', o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 17 = 0),
        |latest AS (
        |  SELECT k, op, price, status FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM chg)
        |  WHERE rn = 1),
        |applied AS (
        |  SELECT CASE WHEN l.op IS NULL THEN 'kept'
        |              WHEN l.op = 'D' THEN 'deleted'
        |              WHEN l.op = 'U' THEN 'updated'
        |              ELSE 'inserted' END AS disposition,
        |         CASE WHEN l.op = 'U' OR l.op = 'I' THEN l.price
        |              ELSE b.o_totalprice END AS price,
        |         COALESCE(b.o_orderstatus, l.status) AS status
        |  FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.k)
        |SELECT status, disposition, COUNT(*) AS n,
        |       CAST(ROUND(SUM(CAST(price AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_price
        |FROM applied WHERE disposition <> 'deleted'
        |GROUP BY 1, 2 ORDER BY status, disposition""".stripMargin
    )
  )
}

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
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 6: the Spark 4 SQL-surface features — the VARIANT
  * semi-structured type (q177), SQL scripting with control flow (q178),
  * and session variables (q179). Each is the ENGINE-NATIVE path for a
  * workload the library already serves through older surfaces (q28's
  * get_json_object, driver-side loops, literal inlining), declared here
  * so a reference user migrating semi-structured or procedural workloads
  * has the modern form, still under the same DuckDB oracle gate.
  */
object Round10f {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q177
    // VARIANT ingestion of the events.props JSON: parse once into the
    // binary semi-structured type, extract a typed path, aggregate — the
    // Spark 4 columnar-JSON path (q28 is the string-functions form). At
    // 100 TB the parse happens once at ingest and lands in parquet as a
    // VARIANT column; every later reader does binary path-extraction
    // instead of re-parsing strings. Exact integer aggregates; avg a raw
    // quotient.
    "q177_variant_json" -> QDef(
      (s, d) =>
        events(s, d)
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("k").cast("long")).as("sum_k"),
            countDistinct(col("k")).as("n_distinct_k"))
          .withColumn("avg_k", col("sum_k") / col("n"))
          .orderBy("event_type"),
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS n_distinct_k,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) / COUNT(*)
        |         AS avg_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
    ),

    // --------------------------------------------------------------- q178
    // SQL scripting (Spark 4 BEGIN…END control flow): an iterative
    // threshold search — double the threshold until at most 1000 events
    // clear it, then report the per-type survivors. The loop is
    // DATA-driven but has a closed form (thr = 2^k for the smallest k
    // whose clear-count ≤ 1000), which is exactly how the DuckDB oracle
    // replays it — the same trick the q104 recursive-hierarchy oracle
    // uses for iteration. Scale shape: the loop iterates over a
    // PRECOMPUTED monotone count table — one scan of events builds per
    // (event_type, lvl) counts where lvl = #thresholds the value clears
    // (≤ types × 22 rows, materialized via localCheckpoint), so each
    // WHILE probe and the final report cost O(tiny) regardless of corpus
    // size (the naive per-iteration COUNT re-scanned events ~10×). What
    // remains at bench scale is the scripting iteration floor itself —
    // ~0.2 s of per-statement planning × ~10 probes (~2.2 s warm, data-
    // independent; the CLAUDE.md iterative-query floor, here per probe
    // instead of per localCheckpoint).
    // Bounded: value ≤ ~561 at every SF, so k ≤ 11 always terminates;
    // the ladder is exact double comparisons (no log2 — boundary values
    // under a half-ulp-correct log could mis-bucket).
    "q178_sql_script" -> QDef(
      (s, d) => {
        s.conf.set("spark.sql.scripting.enabled", "true")
        val lvl = (0 to 20)
          .map(k => s"CAST(COALESCE(value >= ${math.pow(2.0, k)}, false) AS INT)")
          .mkString(" + ")
        events(s, d).selectExpr("event_type", s"($lvl) AS lvl")
          .groupBy("event_type", "lvl")
          .agg(count(lit(1)).as("n"))
          .coalesce(1) // ≤ types × 22 rows: 1-task WHILE probes
          .localCheckpoint()
          .createOrReplaceTempView("graft_q178_cnt")
        s.sql(
          """BEGIN
            |  DECLARE k INT DEFAULT 0;
            |  WHILE (SELECT COALESCE(SUM(n), 0) FROM graft_q178_cnt WHERE lvl > k)
            |        > 1000 DO
            |    SET k = k + 1;
            |  END WHILE;
            |  SELECT event_type, POWER(2.0, k) AS threshold, SUM(n) AS n_over
            |  FROM graft_q178_cnt WHERE lvl > k
            |  GROUP BY event_type ORDER BY event_type;
            |END""".stripMargin)
      },
      """WITH ks AS (SELECT unnest(generate_series(0, 20)) AS k),
        |counted AS (SELECT k, POWER(2.0, k) AS thr,
        |              (SELECT COUNT(*) FROM events WHERE value >= POWER(2.0, k)) AS c
        |            FROM ks),
        |pick AS (SELECT MIN(thr) AS thr FROM counted WHERE c <= 1000)
        |SELECT event_type, pick.thr AS threshold, COUNT(*) AS n_over
        |FROM events CROSS JOIN pick
        |WHERE value >= pick.thr
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin
    ),

    // --------------------------------------------------------------- q179
    // Session variables (Spark 4 DECLARE/SET VAR): one variable bound from
    // data (the corpus-wide average order price through the exact decimal
    // bridge), then used twice — as a filter bound and as an output
    // column — the parameterized-query surface (the oracle inlines the
    // same scalar, proving the variable path changes nothing). OR REPLACE
    // keeps the declaration idempotent across reruns in one session.
    "q179_sql_variables" -> QDef(
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_q179_ord")
        s.sql("DECLARE OR REPLACE VARIABLE graft_q179_avg DOUBLE")
        s.sql(
          """SET VAR graft_q179_avg =
            |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            |            / COUNT(*)
            |   FROM graft_q179_ord)""".stripMargin)
        s.sql(
          """SELECT o_orderstatus, graft_q179_avg AS avg_price,
            |       COUNT(*) AS n_above,
            |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            |         / COUNT(*) AS avg_above
            |FROM graft_q179_ord WHERE o_totalprice > graft_q179_avg
            |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      """WITH a AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |             / COUNT(*) AS avg_price
        |           FROM orders)
        |SELECT o_orderstatus, a.avg_price AS avg_price, COUNT(*) AS n_above,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |         AS avg_above
        |FROM orders CROSS JOIN a
        |WHERE o_totalprice > a.avg_price
        |GROUP BY 1, 2 ORDER BY o_orderstatus""".stripMargin
    )
  )
}

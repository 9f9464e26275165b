package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 12: two infrastructure-audit operators — the
  * consistent-hash re-sharding audit (q199: how much data MOVES when the
  * shard count grows, ring vs modular) and the PII-style redaction audit
  * (q200: transform + verify counts for a masking pass).
  *
  * Determinism: every hash is the portable md5-hex→int64 family (the q69
  * convention — identical strings hashed in both engines), ring lookups
  * are integer comparisons over constant-folded arrays, and all reported
  * shares are raw IEEE quotients of exact int64 counts.
  */
object Round10l {
  import Tables._

  /** Portable doc hash in [0, 2^60): first 15 md5 hex chars as int64 —
    * the q69/md5Bucket family without the modulus. */
  private def h60(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q199
    // Consistent-hash re-sharding audit: when a cluster grows 8 → 9
    // shards, how many keys MOVE? Two schemes over the same portable
    // key hash h ∈ [0, 2^60): (a) a consistent-hash ring (8 vnodes per
    // node at md5 positions; owner = last ring point with pos ≤ h,
    // wrapping to the ring's last point below the minimum) — adding a
    // node relocates only the key ranges its vnodes capture (expected
    // movement ≈ 1/9); (b) modular sharding h % n, which reassigns
    // nearly everything (expected ≈ 8/9). The audit a platform runs
    // before choosing a partition-assignment scheme for growable state.
    // Scale shape: the rings are CONSTANT-FOLDED literal arrays (md5 of
    // constants folds at plan time — no join at all); per-row owner
    // lookup is an array filter over 64/72 elements inside codegen; the
    // rollup is one conditional aggregation (3 summary rows out).
    // Wraparound/empty-filter edges use try_element_at(…, -1) ⇒ NULL,
    // coalesced to the ring's last point — same spelling in DuckDB via
    // list[-1] on the filtered list, which is NULL when empty.
    "q199_shard_move" -> QDef(
      (s, d) => {
        def ringExpr(nNodes: Int): String =
          s"""sort_array(flatten(transform(sequence(0, ${nNodes - 1}), n ->
             |  transform(sequence(0, 7), v ->
             |    struct(CAST(conv(substring(md5(concat('n', CAST(n AS STRING),
             |      '#', CAST(v AS STRING))), 1, 15), 16, 10) AS BIGINT) AS pos,
             |      n AS node)))))""".stripMargin
        def owner(ring: String): String =
          s"""coalesce(try_element_at(filter($ring, x -> x.pos <= h), -1).node,
             |  element_at($ring, -1).node)""".stripMargin
        val assigned = documents(s, d)
          .select(h60(col("doc_id")).as("h"))
          .selectExpr("h",
            s"${owner(ringExpr(8))} AS ring8",
            s"${owner(ringExpr(9))} AS ring9",
            "h % 8 AS mod8", "h % 9 AS mod9")
        assigned.agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("ring8") =!= col("ring9"), 1L).otherwise(0L))
              .as("moved_ring"),
            sum(when(col("mod8") =!= col("mod9"), 1L).otherwise(0L))
              .as("moved_mod"))
          .select(col("n_docs"), col("moved_ring"), col("moved_mod"),
            (col("moved_ring").cast("double") / col("n_docs"))
              .as("ring_move_share"),
            (col("moved_mod").cast("double") / col("n_docs"))
              .as("mod_move_share"))
      },
      """WITH pts AS (
        |  SELECT n, v,
        |         CAST(('0x' || substring(md5('n' || CAST(n AS VARCHAR) || '#'
        |                || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS p
        |  FROM (SELECT unnest(generate_series(0, 8)) AS n) a
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS v) b),
        |r8 AS (SELECT list(struct_pack(pos := p, node := n) ORDER BY p, n) AS r
        |       FROM pts WHERE n < 8),
        |r9 AS (SELECT list(struct_pack(pos := p, node := n) ORDER BY p, n) AS r
        |       FROM pts),
        |assigned AS (
        |  SELECT h,
        |         coalesce(list_filter(r8.r, x -> x.pos <= h)[-1].node,
        |                  r8.r[-1].node) AS ring8,
        |         coalesce(list_filter(r9.r, x -> x.pos <= h)[-1].node,
        |                  r9.r[-1].node) AS ring9,
        |         h % 8 AS mod8, h % 9 AS mod9
        |  FROM (SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
        |                     1, 15)) AS BIGINT) AS h
        |        FROM documents) docs
        |  CROSS JOIN r8 CROSS JOIN r9)
        |SELECT COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN ring8 <> ring9 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS moved_ring,
        |       CAST(SUM(CASE WHEN mod8 <> mod9 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS moved_mod,
        |       CAST(SUM(CASE WHEN ring8 <> ring9 THEN 1 ELSE 0 END) AS BIGINT)
        |         / CAST(COUNT(*) AS DOUBLE) AS ring_move_share,
        |       CAST(SUM(CASE WHEN mod8 <> mod9 THEN 1 ELSE 0 END) AS BIGINT)
        |         / CAST(COUNT(*) AS DOUBLE) AS mod_move_share
        |FROM assigned""".stripMargin
    ),

    // --------------------------------------------------------------- q200
    // Redaction audit: mask every digit run in the event props payload
    // (the PII-scrub shape: transform + PROVE the transform) and report,
    // per event type, exactly what was masked — events touched, digit
    // runs, characters removed, and the distinct post-redaction forms
    // (a collapsed-cardinality check: if redaction works, the payload
    // space collapses to its templates). Scale shape: one scan, all
    // per-row expressions codegen'd, map-side-combinable rollup keyed by
    // the 5-value event type; regex is the portable class '[0-9]+'
    // (identical semantics in Java and RE2-style engines).
    "q200_redaction" -> QDef(
      (s, d) => {
        events(s, d)
          .select(col("event_type"), col("props"),
            regexp_replace(col("props"), "[0-9]+", "#").as("red"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("props") =!= col("red"), 1L).otherwise(0L)).as("n_hit"),
            sum(size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long"))
              .as("n_runs"),
            sum((length(col("props")) - length(col("red"))).cast("long") +
              size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long"))
              .as("n_chars_masked"),
            countDistinct(col("red")).as("n_templates"))
          .orderBy("event_type")
      },
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CASE WHEN props <> red THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_hit,
        |       CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
        |         AS n_runs,
        |       CAST(SUM(len(props) - len(red)
        |                + len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
        |         AS n_chars_masked,
        |       COUNT(DISTINCT red) AS n_templates
        |FROM (SELECT event_type, props,
        |             regexp_replace(props, '[0-9]+', '#', 'g') AS red
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 12: infrastructure-audit operators — the
  * consistent-hash re-sharding audit (q199: how much data MOVES when the
  * shard count grows, ring vs modular), the PII-style redaction audit
  * (q200: transform + verify counts for a masking pass), the native
  * as-of join's TOLERANCE path as a declared query (q201: attribution
  * windows), and a declarative data-quality constraint suite (q202).
  *
  * Determinism: every hash is the portable md5-hex→int64 family (the q69
  * convention — identical strings hashed in both engines), ring lookups
  * are integer comparisons over constant-folded arrays, timestamps
  * compare exactly (micros in both engines), and all reported shares are
  * raw IEEE quotients of exact int64 counts.
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
    ),

    // --------------------------------------------------------------- q201
    // As-of join WITH TOLERANCE: each purchase attributed to the user's
    // latest click STRICTLY BEFORE it, but only if that click is within
    // the 1-hour attribution window — the marketing-attribution shape,
    // and the declared-query gate for the native operator's tolerance
    // path (plans/AsOfJoin toleranceMicros; strict/plain forms are
    // q64/q68). Scale shape: the native plan declares distribution on
    // user_id and (user_id, ts) ordering — one exchange+sort per side,
    // then a linear per-partition merge; no window over the raw stream,
    // no inequality join. Tolerance is evaluated against the latest
    // earlier click (attribution semantics: an old click does NOT fall
    // through to an even older one), which is exactly how the oracle's
    // MAX-then-filter spells it.
    "q201_asof_tolerance" -> QDef(
      (s, d) => {
        val ev = events(s, d)
        graft.plans.AsOfJoin.asof(
          left = ev.where(col("event_type") === "purchase"),
          right = ev.where(col("event_type") === "click"),
          leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("ts" -> "attrib_click_ts"),
          toleranceMicros = 3600L * 1000 * 1000)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("attrib_click_ts"),
            col("attrib_click_ts").isNotNull.cast("int").as("attributed"))
          .orderBy("event_id")
      },
      """WITH last AS (
        |  SELECT p.event_id, p.user_id, p.ts, MAX(c.ts) AS last_click_ts
        |  FROM events p LEFT JOIN events c
        |    ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY p.event_id, p.user_id, p.ts)
        |SELECT event_id, user_id, ts,
        |       CASE WHEN last_click_ts >= ts - INTERVAL 1 HOUR
        |            THEN last_click_ts END AS attrib_click_ts,
        |       CASE WHEN last_click_ts >= ts - INTERVAL 1 HOUR
        |            THEN 1 ELSE 0 END AS attributed
        |FROM last ORDER BY event_id""".stripMargin
    ),

    // --------------------------------------------------------------- q202
    // Declarative data-quality constraint suite — the dbt-style audit a
    // warehouse runs per ingest, as ONE query: primary-key uniqueness,
    // referential integrity, accepted values, non-negativity, and date
    // range, each reported as (constraint, n_checked, n_violations).
    // Scale shape: one conditional-aggregation pass per table (uniqueness
    // via n − distinct in the same agg), the FK check is a broadcast
    // anti-join count, and the suite assembles by unioning 1-row
    // aggregates unpivoted through stack() — every build side is a
    // grouping-free aggregate (bounded by construction for the NLJ gate).
    "q202_dq_suite" -> QDef(
      (s, d) => {
        val o = orders(s, d)
        val oAgg = o.agg(
          count(lit(1)).as("n"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
            .as("v_status"),
          sum(when(col("o_orderdate") < lit("1990-01-01").cast("date") ||
            col("o_orderdate") > lit("2005-12-31").cast("date"), 1L)
            .otherwise(0L)).as("v_date"))
        val fkViol = o.join(customer(s, d),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("v_fk"))
        val l = lineitem(s, d)
        val lAgg = l.agg(
          count(lit(1)).as("n"),
          sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("v_qty"),
          sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("v_price"))
        val oRows = oAgg.crossJoin(broadcast(fkViol)).selectExpr(
          """stack(4,
            |  'orders_pk_unique', n, v_pk,
            |  'orders_fk_customer', n, v_fk,
            |  'orders_status_accepted', n, v_status,
            |  'orders_date_range', n, v_date)
            |AS (`constraint`, n_checked, n_violations)""".stripMargin)
        val lRows = lAgg.selectExpr(
          """stack(2,
            |  'lineitem_qty_positive', n, v_qty,
            |  'lineitem_price_nonneg', n, v_price)
            |AS (`constraint`, n_checked, n_violations)""".stripMargin)
        oRows.unionByName(lRows)
          .select(col("constraint"), col("n_checked"), col("n_violations"),
            (col("n_violations") === 0).cast("int").as("passed"))
          .orderBy("constraint")
      },
      """WITH o AS (
        |  SELECT COUNT(*) AS n,
        |         COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_pk,
        |         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |         CAST(SUM(CASE WHEN o_orderdate < DATE '1990-01-01'
        |                         OR o_orderdate > DATE '2005-12-31'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_date
        |  FROM orders),
        |fk AS (SELECT COUNT(*) AS v_fk FROM orders
        |       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |l AS (SELECT COUNT(*) AS n,
        |             CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS v_qty,
        |             CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS v_price
        |      FROM lineitem),
        |rows AS (
        |  SELECT 'orders_pk_unique' AS "constraint", o.n AS n_checked,
        |         o.v_pk AS n_violations FROM o
        |  UNION ALL SELECT 'orders_fk_customer', o.n, fk.v_fk FROM o CROSS JOIN fk
        |  UNION ALL SELECT 'orders_status_accepted', o.n, o.v_status FROM o
        |  UNION ALL SELECT 'orders_date_range', o.n, o.v_date FROM o
        |  UNION ALL SELECT 'lineitem_qty_positive', l.n, l.v_qty FROM l
        |  UNION ALL SELECT 'lineitem_price_nonneg', l.n, l.v_price FROM l)
        |SELECT "constraint", n_checked, n_violations,
        |       CAST(n_violations = 0 AS INTEGER) AS passed
        |FROM rows ORDER BY "constraint"""".stripMargin
    )
  )
}

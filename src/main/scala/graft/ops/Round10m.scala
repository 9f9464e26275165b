package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 13: cross-table financial reconciliation (q203 — does
  * each order's header total re-derive from its line items?) and a
  * deterministic distributed bootstrap (q204 — resampled uncertainty for
  * a pipeline metric without any randomness source).
  *
  * Determinism: money doubles enter integer space through the CLAUDE.md
  * quantize bridge (FLOOR(x·100) — the multiply and floor are identical
  * IEEE ops in both engines), every aggregate is an exact int64 sum, and
  * the bootstrap's "randomness" is the portable md5-hex→int64 hash with a
  * FIXED integer probability ladder (no floating-point Poisson anywhere).
  */
object Round10m {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q203
    // Order↔lineitem financial reconciliation: re-derive each order's
    // total from its lines as Σ cents(extprice)·(100−cents(disc))·
    // (100+cents(tax)) in exact micro-units and compare against the
    // header total — the star-schema consistency audit every warehouse
    // runs on ingest (the cross-TABLE complement of q116's same-stream
    // reconcile). Reported per order status: orders, exact matches,
    // within-a-cent matches, mismatches, headers without lines, and the
    // worst absolute divergence. Scale shape: ONE map-side-combinable
    // rollup of lineitem to order grain, an equi-join to orders on the
    // order key (both sides shuffle-partitioned by the key; at warehouse
    // scale both tables would be bucketed on it — the q126 layout), and
    // a ≤|status|-row conditional aggregation. Bounds: micro units ≤
    // 1e7·100·200 = 2e11 per line — Σ per order ≪ int64.
    "q203_order_reconcile" -> QDef(
      (s, d) => {
        val li = lineitem(s, d).select(col("l_orderkey"),
          (floor(col("l_extendedprice") * 100) *
            (lit(100) - floor(col("l_discount") * 100)) *
            (lit(100) + floor(col("l_tax") * 100))).cast("long").as("micro"))
          .groupBy("l_orderkey")
          .agg(sum("micro").as("li_micro"), count(lit(1)).as("n_lines"))
        orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
            (floor(col("o_totalprice") * 100) * lit(10000L)).cast("long")
              .as("o_micro"))
          .join(li, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderstatus"),
            col("n_lines").isNull.cast("long").as("no_lines"),
            when(col("n_lines").isNull, lit(null).cast("long"))
              .otherwise(abs(col("o_micro") - col("li_micro"))).as("adiff"))
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n_orders"),
            sum("no_lines").as("n_no_lines"),
            sum(when(col("adiff") === 0, 1L).otherwise(0L)).as("n_exact"),
            sum(when(col("adiff") > 0 && col("adiff") <= 10000, 1L)
              .otherwise(0L)).as("n_within_cent"),
            sum(when(col("adiff") > 10000, 1L).otherwise(0L)).as("n_off"),
            max("adiff").as("max_abs_diff_micro"))
          .orderBy("o_orderstatus")
      },
      """WITH li AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) *
        |                       (100 - FLOOR(l_discount * 100)) *
        |                       (100 + FLOOR(l_tax * 100)) AS BIGINT))
        |              AS BIGINT) AS li_micro,
        |         COUNT(*) AS n_lines
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderstatus,
        |         CAST(li.n_lines IS NULL AS BIGINT) AS no_lines,
        |         CASE WHEN li.n_lines IS NULL THEN NULL
        |              ELSE abs(CAST(FLOOR(o.o_totalprice * 100) * 10000
        |                            AS BIGINT) - li.li_micro) END AS adiff
        |  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |       CAST(SUM(no_lines) AS BIGINT) AS n_no_lines,
        |       CAST(SUM(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_exact,
        |       CAST(SUM(CASE WHEN adiff > 0 AND adiff <= 10000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_within_cent,
        |       CAST(SUM(CASE WHEN adiff > 10000 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_off,
        |       MAX(adiff) AS max_abs_diff_micro
        |FROM j GROUP BY 1 ORDER BY o_orderstatus""".stripMargin
    ),

    // --------------------------------------------------------------- q204
    // Deterministic distributed bootstrap: 64 Poissonized resamples of
    // the mean order value, with NO randomness source — each (order,
    // replicate) draws its Poisson(1) weight from the portable md5 hash
    // through a FIXED integer cumulative ladder (⌊1e5·P(X≤k)⌋ constants
    // baked into the query — nothing floating to diverge). The spread of
    // the 64 resample means IS the metric's uncertainty; the CI is read
    // off the ordered output. Scale shape: a 64× map-side explode whose
    // per-replicate partial sums collapse before the shuffle (the q192
    // argument — groupBy cardinality 64 at any corpus size); one pass,
    // no window. The classic alternative — n draws per replicate with a
    // multinomial — does not distribute; Poissonization is the textbook
    // scale-out form.
    "q204_bootstrap_ci" -> QDef(
      (s, d) => {
        orders(s, d).select(col("o_orderkey"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .select(col("o_orderkey"), col("cents"),
            explode(expr("sequence(0, 63)")).as("b"))
          .withColumn("u",
            conv(substring(md5(concat(col("o_orderkey").cast("string"),
              lit("#"), col("b").cast("string"))), 1, 15), 16, 10)
              .cast("long") % 100000)
          .withColumn("w",
            when(col("u") < 36788, 0L).when(col("u") < 73576, 1L)
              .when(col("u") < 91970, 2L).when(col("u") < 98101, 3L)
              .when(col("u") < 99634, 4L).when(col("u") < 99941, 5L)
              .when(col("u") < 99992, 6L).otherwise(7L))
          .groupBy("b")
          .agg(sum("w").as("n_eff"), sum(col("w") * col("cents")).as("swc"))
          .select(col("b"), col("n_eff"),
            (col("swc").cast("double") / col("n_eff") / lit(100))
              .as("mean_value"))
          .orderBy("b")
      },
      """WITH base AS (
        |  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |ex AS (
        |  SELECT o_orderkey, cents, l.b,
        |         CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '#'
        |                || CAST(l.b AS VARCHAR)), 1, 15)) AS BIGINT) % 100000 AS u
        |  FROM base CROSS JOIN
        |    (SELECT CAST(unnest(generate_series(0, 63)) AS INTEGER) AS b) l),
        |w AS (
        |  SELECT b, CASE WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
        |                 WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3
        |                 WHEN u < 99634 THEN 4 WHEN u < 99941 THEN 5
        |                 WHEN u < 99992 THEN 6 ELSE 7 END AS w,
        |         cents
        |  FROM ex)
        |SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
        |       CAST(CAST(SUM(w * cents) AS BIGINT) AS DOUBLE)
        |         / CAST(SUM(w) AS BIGINT) / 100 AS mean_value
        |FROM w GROUP BY 1 ORDER BY b""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 ordered-series and audit operators: gaps-and-islands activity
  * streaks, peak-to-trough drop detection, deterministic per-group mode,
  * and an order-book reconciliation — the retention / monitoring /
  * bookkeeping surfaces that sit on top of the event-analytics family
  * (q85–q88, q100, q109–q110).
  *
  * Determinism contract (CLAUDE.md): streak arithmetic is exact
  * int32/date space; drop detection runs entirely in the DECIMAL(18,4)
  * bridge (exact, order-independent) with one terminal double cast per
  * column; mode ties break on a total (n DESC, key ASC) order;
  * reconciliation keeps every product inside decimal widths where
  * w1+w2 <= 38 so neither engine rounds or overflows (operand precision
  * >= 19 forces DuckDB's int128 physical type — the q90/q111 lesson).
  */
object Series {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q113
    // Longest consecutive-day activity streak per user — the classic
    // gaps-and-islands rewrite. Island key = datediff(day, epoch) - rn,
    // exact integer space. Plan shape: distinct user-days (one shuffle on
    // user_id via the window), then BOTH windows and the island groupBy
    // share the user_id partitioning — one exchange total, each user's
    // days buffered in a spillable sorter, never collected. Tie-break:
    // longest streak, then earliest start (total order, both engines).
    "q113_streaks" -> QDef(
      (s, d) => {
        val byDay = Window.partitionBy("user_id").orderBy("day")
        val best = Window.partitionBy("user_id")
          .orderBy(col("len").desc, col("start_day"))
        events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
          .withColumn("rn", row_number().over(byDay))
          .withColumn("grp",
            datediff(col("day"), lit("1970-01-01").cast("date")) - col("rn"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"), min("day").as("start_day"),
            max("day").as("end_day"))
          .withColumn("rk", row_number().over(best))
          .where(col("rk") === 1)
          .select("user_id", "len", "start_day", "end_day")
          .orderBy("user_id")
      },
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |              FROM events),
        |r AS (SELECT user_id, day,
        |        row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |      FROM days),
        |st AS (SELECT user_id, (day - DATE '1970-01-01') - rn AS grp,
        |         COUNT(*) AS len, MIN(day) AS start_day, MAX(day) AS end_day
        |       FROM r GROUP BY 1, 2),
        |b AS (SELECT user_id, len, start_day, end_day,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY len DESC, start_day) AS rk
        |      FROM st)
        |SELECT user_id, len, start_day, end_day FROM b WHERE rk = 1
        |ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q114
    // Largest peak-to-trough drop per user's metric series — the alert a
    // monitoring store raises when a reading collapses from any earlier
    // high. One scan, one user_id window: running max of the reading so
    // far (rows unbounded-preceding..current), drop = peak - reading,
    // then a co-partitioned per-user rollup. Entirely exact decimal:
    // readings enter the DECIMAL(18,4) bridge, running max and
    // subtraction are exact, so the only float ops are the terminal
    // casts. Window and groupBy share the user_id exchange.
    "q114_peak_drop" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("sec", expr("unix_micros(ts) DIV 1000000"))
          .withColumn("v", col("value").cast(graft.Det.D))
          .withColumn("peak", max("v").over(w))
          .withColumn("drop", col("peak") - col("v"))
          .groupBy("user_id")
          .agg(max("peak").cast("double").as("peak"),
            max("drop").cast("double").as("max_drop"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_id,
        |                   CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |p AS (SELECT user_id, v,
        |        MAX(v) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |      FROM ev)
        |SELECT user_id, CAST(MAX(peak) AS DOUBLE) AS peak,
        |       CAST(MAX(peak - v) AS DOUBLE) AS max_drop,
        |       COUNT(*) AS n_events
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q115
    // Deterministic mode: each user's most frequent event type, ties
    // broken by (count DESC, type ASC) — a TOTAL order, so both engines
    // must pick the same row (DuckDB's mode() and Spark's mode both
    // leave ties unspecified; the window rewrite is the portable form).
    // Plan: one scan, (user, type) hash aggregate (map-side combined),
    // then the ranking window and the share window both reuse the
    // user_id partitioning. Share is one raw IEEE division of exact
    // int64 counts.
    "q115_mode" -> QDef(
      (s, d) => {
        val rankW = Window.partitionBy("user_id")
          .orderBy(col("n").desc, col("event_type"))
        val totalW = Window.partitionBy("user_id")
        events(s, d)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("total", sum("n").over(totalW))
          .withColumn("rk", row_number().over(rankW))
          .where(col("rk") === 1)
          .select(col("user_id"), col("event_type").as("mode_type"), col("n"),
            (col("n").cast("double") / col("total").cast("double")).as("share"))
          .orderBy("user_id")
      },
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, n,
        |        SUM(n) OVER (PARTITION BY user_id) AS total,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY n DESC, event_type) AS rk
        |      FROM c)
        |SELECT user_id, event_type AS mode_type, n,
        |       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q116
    // Order-book reconciliation: recompute every order's total from its
    // line items as SUM(extendedprice * (1-discount) * (1+tax)) in EXACT
    // decimal and compare against the booked o_totalprice, rolled up per
    // order status — the bookkeeping audit that catches drift between a
    // fact table and its rollup. Width discipline: extendedprice enters
    // at DECIMAL(19,2) (precision >= 19 forces DuckDB's int128 physical
    // multiply), the (7,4) factor products land at (33..35,10) <= 38 so
    // NEITHER engine rounds; the per-order sum is bridged to (28,10).
    // Plan: lineitem aggregates BEFORE the join (partial-agg'd, orders-
    // sized not lineitem-sized), one equi-join, one 3-row rollup.
    "q116_reconcile" -> QDef(
      (s, d) => {
        val one4 = lit(1).cast("decimal(6,4)")
        val recomputed = lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(col("l_extendedprice").cast("decimal(19,2)") *
              (one4 - col("l_discount").cast("decimal(6,4)")) *
              (one4 + col("l_tax").cast("decimal(6,4)")))
            .cast("decimal(28,10)").as("recomputed"))
        orders(s, d)
          .join(recomputed, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderstatus"),
            col("o_totalprice").cast("decimal(19,2)").as("booked"),
            col("recomputed"))
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n_orders"),
            count(col("recomputed")).as("n_with_items"),
            sum(when(col("booked").cast("decimal(29,10)") === col("recomputed"),
              1L).otherwise(0L)).as("n_exact"),
            sum("booked").cast("double").as("sum_booked"),
            // wide-scale decimals leave as STRINGS: the unscaled values
            // exceed 2^53, so any double hop double-rounds differently per
            // engine, and the driver's DuckDB client materializes DECIMAL
            // as float64 (round-7 hash-fail on identical values). The
            // string rendering is portable at EVERY magnitude: Spark
            // 4.1.2's decimal→string cast prints plain notation even where
            // java BigDecimal.toString would go scientific (0E-10, 1E-7 —
            // probed in round 9), matching DuckDB's always-plain VARCHAR
            // cast; InvariantSpec locks that property so a Spark upgrade
            // that regresses it fails by name.
            sum("recomputed").cast("decimal(28,10)").cast("string")
              .as("sum_recomputed"),
            max(abs(col("booked") - col("recomputed"))).cast("decimal(28,10)")
              .cast("string").as("max_abs_diff"))
          .orderBy("o_orderstatus")
      },
      """WITH comp AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2))
        |             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
        |             * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))))
        |      AS DECIMAL(28,10)) AS recomputed
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT o_orderstatus,
        |        CAST(o_totalprice AS DECIMAL(19,2)) AS booked, recomputed
        |      FROM orders LEFT JOIN comp ON o_orderkey = l_orderkey)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |       COUNT(recomputed) AS n_with_items,
        |       CAST(SUM(CASE WHEN CAST(booked AS DECIMAL(29,10)) = recomputed
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |       CAST(SUM(booked) AS DOUBLE) AS sum_booked,
        |       CAST(CAST(SUM(recomputed) AS DECIMAL(28,10)) AS VARCHAR)
        |         AS sum_recomputed,
        |       CAST(CAST(MAX(ABS(booked - recomputed)) AS DECIMAL(28,10))
        |              AS VARCHAR) AS max_abs_diff
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // --------------------------------------------------------------- q117
    // Winsorized mean of value per event type: clamp to the [p05, p95]
    // caps, then average — the outlier-robust mean a metrics pipeline
    // reports next to the raw one. Exact percentiles by ORDERED POSITION
    // (rank ceil(n/20) / ceil(19n/20) in pure integer arithmetic), not
    // interpolation: both engines pick the SAME actual data value, so no
    // float enters until the terminal casts. One scan; the rank window,
    // the cap windows, and the final groupBy all share the event_type
    // partitioning (per-type rows buffered in a spillable sorter).
    "q117_winsorized" -> QDef(
      (s, d) => {
        val byV = Window.partitionBy("event_type").orderBy("v", "event_id")
        val all = Window.partitionBy("event_type")
        events(s, d)
          .select(col("event_type"), col("event_id"),
            col("value").cast(graft.Det.D).as("v"))
          .withColumn("rn", row_number().over(byV))
          .withColumn("n", count(lit(1)).over(all))
          .withColumn("lo",
            max(when(col("rn") === expr("(n + 19) DIV 20"), col("v"))).over(all))
          .withColumn("hi",
            max(when(col("rn") === expr("(19 * n + 19) DIV 20"), col("v")))
              .over(all))
          .groupBy("event_type")
          .agg(max("n").as("n"), max("lo").cast("double").as("lo"),
            max("hi").cast("double").as("hi"),
            // clamp via CASE, not least/greatest: DuckDB's LEAST/GREATEST
            // promote DECIMAL args to DOUBLE (measured — float dust in the
            // sum), while CASE keeps the branch type; Spark mirrors the
            // spelling so both sums stay exact decimal
            (sum(when(col("v") < col("lo"), col("lo"))
              .when(col("v") > col("hi"), col("hi"))
              .otherwise(col("v"))).cast("double") / max("n")).as("wmean"))
          .orderBy("event_type")
      },
      """WITH ev AS (SELECT event_type, event_id,
        |              CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |o AS (SELECT event_type, v,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY v, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM ev),
        |c AS (SELECT event_type, v, n,
        |        MAX(CASE WHEN rn = (n + 19) // 20 THEN v END)
        |          OVER (PARTITION BY event_type) AS lo,
        |        MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN v END)
        |          OVER (PARTITION BY event_type) AS hi
        |      FROM o)
        |SELECT event_type, MAX(n) AS n,
        |       CAST(MAX(lo) AS DOUBLE) AS lo, CAST(MAX(hi) AS DOUBLE) AS hi,
        |       CAST(SUM(CASE WHEN v < lo THEN lo WHEN v > hi THEN hi
        |                     ELSE v END) AS DOUBLE) / MAX(n) AS wmean
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // --------------------------------------------------------------- q118
    // Median absolute deviation of value per event type — the robust
    // spread estimate (stddev needs a double mean; MAD never leaves
    // decimal space). Median = lower median by ordered position
    // ((n+1) DIV 2), absolute deviations stay exact decimal, then a
    // second ordered-position pass picks the MAD. Two sort windows over
    // the SAME event_type partitioning — one exchange, two in-partition
    // sorts, no interpolation anywhere.
    "q118_mad" -> QDef(
      (s, d) => {
        val byV = Window.partitionBy("event_type").orderBy("v", "event_id")
        val byAd = Window.partitionBy("event_type").orderBy("ad", "event_id")
        val all = Window.partitionBy("event_type")
        events(s, d)
          .select(col("event_type"), col("event_id"),
            col("value").cast(graft.Det.D).as("v"))
          .withColumn("rn", row_number().over(byV))
          .withColumn("n", count(lit(1)).over(all))
          .withColumn("med",
            max(when(col("rn") === expr("(n + 1) DIV 2"), col("v"))).over(all))
          .withColumn("ad", abs(col("v") - col("med")))
          .withColumn("rn2", row_number().over(byAd))
          .withColumn("mad",
            max(when(col("rn2") === expr("(n + 1) DIV 2"), col("ad"))).over(all))
          .groupBy("event_type")
          .agg(max("n").as("n"), max("med").cast("double").as("med"),
            max("mad").cast("double").as("mad"))
          .orderBy("event_type")
      },
      """WITH ev AS (SELECT event_type, event_id,
        |              CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |o AS (SELECT event_type, event_id, v,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY v, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM ev),
        |m AS (SELECT event_type, event_id, v, n,
        |        MAX(CASE WHEN rn = (n + 1) // 2 THEN v END)
        |          OVER (PARTITION BY event_type) AS med
        |      FROM o),
        |a AS (SELECT event_type, event_id, n, med, ABS(v - med) AS ad FROM m),
        |r AS (SELECT event_type, n, med, ad,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY ad, event_id) AS rn2
        |      FROM a)
        |SELECT event_type, MAX(n) AS n, CAST(MAX(med) AS DOUBLE) AS med,
        |       CAST(MAX(CASE WHEN rn2 = (n + 1) // 2 THEN ad END) AS DOUBLE)
        |         AS mad
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // --------------------------------------------------------------- q120
    // Gini coefficient of value per event type — the inequality measure a
    // revenue/exposure dashboard reports next to the mean. Uses the
    // rank-sum identity gini = sum((2*i - n - 1) * v_i) / (n * sum(v))
    // over values sorted ascending: the per-row coefficient keeps every
    // product inside DECIMAL(29,4) (w1+w2+1 <= 38, no rounding on either
    // engine; operand precision >= 19 forces DuckDB int128 — the q116
    // lesson), both sums are exact decimal, and the single division is
    // one raw IEEE quotient of two correctly-rounded casts. Tie-safe by
    // construction: permuting equal values reassigns coefficients within
    // a group whose values are identical, so the rank-sum is invariant —
    // the (v, event_id) order is only needed to make row_number total.
    // One scan; rank window, count window, and the rollup all share the
    // event_type partitioning. Portability bound: the decimal→double
    // casts hold while the unscaled sums fit 2^53 (fine through sf0.1's
    // 1e15; at cluster scale emit num/den as DECIMAL columns instead —
    // the q116 wide-scale rule).
    "q120_gini" -> QDef(
      (s, d) => {
        val byV = Window.partitionBy("event_type").orderBy("v", "event_id")
        val all = Window.partitionBy("event_type")
        events(s, d)
          .select(col("event_type"), col("event_id"),
            col("value").cast(graft.Det.D).as("v"))
          .withColumn("rn", row_number().over(byV))
          .withColumn("n", count(lit(1)).over(all))
          .withColumn("coef",
            (lit(2) * col("rn") - col("n") - lit(1))
              .cast(org.apache.spark.sql.types.DecimalType(10, 0)))
          .groupBy("event_type")
          .agg(max("n").as("n"),
            (sum(col("coef") * col("v")).cast("double") /
              (max("n").cast(org.apache.spark.sql.types.DecimalType(10, 0)) *
                sum(col("v"))
                  .cast(org.apache.spark.sql.types.DecimalType(27, 4)))
                .cast("double")).as("gini"))
          .orderBy("event_type")
      },
      """WITH ev AS (SELECT event_type, event_id,
        |              CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |o AS (SELECT event_type, v,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY v, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM ev)
        |SELECT event_type, MAX(n) AS n,
        |       CAST(SUM(CAST(2*rn - n - 1 AS DECIMAL(10,0)) * v) AS DOUBLE) /
        |         CAST(CAST(MAX(n) AS DECIMAL(10,0)) *
        |              CAST(SUM(v) AS DECIMAL(27,4)) AS DOUBLE) AS gini
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // --------------------------------------------------------------- q121
    // Weighted median of extended price per return flag, weighted by
    // quantity — "the price at which half the shipped units are cheaper",
    // the robust per-unit price a procurement report needs (the row
    // median over-weights single-unit lines). Formulation sidesteps
    // lineitem's missing unique key entirely: group to (flag, price)
    // FIRST (price is then a unique sort key — no row-level tie-break
    // needed), cumulative weight in exact int64, and the median is the
    // MIN price whose doubled cumulative weight reaches the total.
    // Quantities are integral doubles (verified), so the bigint cast is
    // exact on both engines despite their different fractional rules
    // (Spark truncates, DuckDB rounds). One shuffle on l_returnflag
    // after a map-side-combined (flag, price) agg; both windows and the
    // final rollup share that partitioning.
    "q121_weighted_median" -> QDef(
      (s, d) => {
        // Per-flag cumulative weight via the range-bucketed two-pass scan
        // (the q63/q71 shape, here GROUPED): a plain per-flag window sorts
        // ~200k distinct prices in only |flags|=3 partitions — the round-8
        // single-task lesson at window granularity. Bucketing the price
        // domain spreads the sort ~32× per flag; the carry window sees
        // <=32 rows per flag and the totals come from a 3-row broadcast.
        // Bucket math is Spark-internal (the oracle keeps its single
        // window) so the double floor needs no cross-engine portability —
        // only determinism, which floor(exact-decimal→double / const) has.
        // r16: grouped is CHECKPOINTED — it has three consumers (the
        // in-bucket window, the bucket carry, the totals), and
        // un-checkpointed each one replayed the 600k-row lineitem scan +
        // (flag, price) aggregate (measured: 3 × ~0.4 s of q121's ~1.5 s
        // count phase; the distinct-price table is price-domain-bounded,
        // ~200k rows, so the checkpoint is small at any corpus size).
        // totals now derives from the ~100-row bucket aggregate instead
        // of a third pass over grouped — identical exact integer sums.
        val grouped = lineitem(s, d)
          .select(col("l_returnflag"),
            col("l_extendedprice").cast(graft.Det.D).as("v"),
            col("l_quantity").cast("long").as("q"))
          .groupBy("l_returnflag", "v")
          .agg(sum("q").as("w"))
          .withColumn("b",
            floor(col("v").cast("double") / 3300.0).cast("long"))
          .localCheckpoint()
        val wIn = Window.partitionBy("l_returnflag", "b").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wCarry = Window.partitionBy("l_returnflag").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bAgg = grouped.groupBy("l_returnflag", "b")
          .agg(sum("w").as("bw"))
        val carry = bAgg
          .withColumn("pre", coalesce(sum("bw").over(wCarry), lit(0L)))
          .select("l_returnflag", "b", "pre")
        val totals = bAgg.groupBy("l_returnflag").agg(sum("bw").as("tw"))
        grouped
          .withColumn("cw_local", sum("w").over(wIn))
          .join(broadcast(carry), Seq("l_returnflag", "b"))
          .join(broadcast(totals), Seq("l_returnflag"))
          .where((col("cw_local") + col("pre")) * 2 >= col("tw"))
          .groupBy("l_returnflag")
          .agg(max("tw").as("total_qty"),
            min("v").cast("double").as("wmedian"))
          .orderBy("l_returnflag")
      },
      """WITH g AS (SELECT l_returnflag,
        |             CAST(l_extendedprice AS DECIMAL(18,4)) AS v,
        |             SUM(CAST(l_quantity AS BIGINT)) AS w
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v, w,
        |        SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |        SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |      FROM g)
        |SELECT l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_qty,
        |       CAST(MIN(v) AS DOUBLE) AS wmedian
        |FROM c WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1""".stripMargin
    )
  )
}

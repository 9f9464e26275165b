package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 event-analytics operators: ordered funnel conversion and
  * time-series gap-fill/resample — the product-analytics surfaces a
  * behavioral events table gets queried with, beyond the windowed
  * aggregations of q31–q33.
  *
  * Determinism contract (CLAUDE.md): counts are int64 on both engines
  * (DuckDB COUNT is BIGINT, never HUGEINT); conversion rates are raw
  * IEEE long/long double quotients, never rounded; gap-fill carries
  * observed doubles verbatim (no arithmetic), so values hash exactly.
  */
object Analytics {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // ---------------------------------------------------------------- q85
    // Ordered funnel: view -> click (at/after the user's FIRST view) ->
    // purchase (at/after that first qualifying click), computed in ONE
    // pass: three stacked whole-partition windows over the same user_id
    // partitioning derive each stage's timestamp from the previous
    // column (conditional min ignores nulls), so the plan is one
    // type-pruned scan + one user_id shuffle + three pipelined Window
    // operators + a co-partitioned per-user rollup. The join-chain form
    // (each stage joined against the previous stage's agg) recomputed
    // every stage subtree per consumer — 11 event scans / 26 exchanges in
    // PlanAudit — and the collect_list fold holds unbounded per-key agg
    // buffers; WindowExec instead buffers one user's funnel events in a
    // SPILLABLE sorter. PlanShapeSpec locks the single-scan shape.
    "q85_funnel" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id")
        val perUser = events(s, d)
          .where(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t_view",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") >= col("t_view"),
              col("ts"))).over(w))
          .withColumn("t_purchase",
            min(when(col("event_type") === "purchase" && col("ts") >= col("t_click"),
              col("ts"))).over(w))
          .groupBy("user_id") // co-partitioned with the windows: no exchange
          .agg(max("t_view").as("tv"), max("t_click").as("tc"),
            max("t_purchase").as("tp"))
        perUser
          .agg(count(col("tv")).as("n_view"), count(col("tc")).as("n_click"),
            count(col("tp")).as("n_purchase"))
          .select(
            col("n_view"), col("n_click"), col("n_purchase"),
            (col("n_click").cast("double") / col("n_view").cast("double"))
              .as("r_click"),
            (col("n_purchase").cast("double") / col("n_click").cast("double"))
              .as("r_purchase"))
      },
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        |SELECT n_view, n_click, n_purchase,
        |       CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE) AS r_click,
        |       CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE) AS r_purchase
        |FROM (SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |             (SELECT COUNT(*) FROM c) AS n_click,
        |             (SELECT COUNT(*) FROM p) AS n_purchase)""".stripMargin
    ),

    // ---------------------------------------------------------------- q86
    // Time-series resample + forward gap-fill: each sampled user's events
    // land on an hourly grid spanning [first, last] observed hour; empty
    // hours carry the last observed value forward (`last(value, ignore
    // nulls)` over an unbounded-preceding row frame). The carried value is
    // copied, never computed, so doubles hash exactly. Per-(user,hour) the
    // latest event wins (ts DESC, event_id DESC — events have no unique
    // (user,ts) key). Everything partitions by user_id: the grid explode
    // is per-user (`sequence` is bounded by that user's span, no global
    // time table), and both windows + the join shuffle on the same key.
    // user_id % 13 carves the demo corpus; at 100 TB the same plan runs
    // unsampled because no operator here is more than per-user-linear.
    "q86_gap_fill" -> QDef(
      (s, d) => {
        val e = events(s, d).where(col("user_id") % 13 === 0)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
            col("ts"), col("event_id"), col("value"))
        val latest = Window.partitionBy("user_id", "hr")
          .orderBy(col("ts").desc, col("event_id").desc)
        val obs = e.withColumn("rn", row_number().over(latest))
          .where(col("rn") === 1).select("user_id", "hr", "value")
        val grid = obs.groupBy("user_id")
          .agg(min("hr").as("hr_min"), max("hr").as("hr_max"))
          .select(col("user_id"),
            explode(sequence(col("hr_min"), col("hr_max"),
              expr("interval 1 hour"))).as("hr"))
        val fill = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(obs, Seq("user_id", "hr"), "left")
          .select(
            col("user_id"), col("hr"),
            last(col("value"), ignoreNulls = true).over(fill).as("v_fill"),
            col("value").isNotNull.cast("int").as("had_obs"))
          .orderBy("user_id", "hr")
      },
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS hr, ts, event_id, value
        |           FROM events WHERE user_id % 13 = 0),
        |obs AS (SELECT user_id, hr, value FROM (
        |          SELECT user_id, hr, value,
        |                 row_number() OVER (PARTITION BY user_id, hr
        |                                    ORDER BY ts DESC, event_id DESC) AS rn
        |          FROM e) WHERE rn = 1),
        |grid AS (SELECT user_id,
        |                unnest(generate_series(hr_min, hr_max, INTERVAL 1 HOUR)) AS hr
        |         FROM (SELECT user_id, MIN(hr) AS hr_min, MAX(hr) AS hr_max
        |               FROM obs GROUP BY 1))
        |SELECT g.user_id, g.hr,
        |       last_value(o.value IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.hr
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
        |       CAST(o.value IS NOT NULL AS INTEGER) AS had_obs
        |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hr = o.hr
        |ORDER BY g.user_id, g.hr""".stripMargin
    ),

    // ---------------------------------------------------------------- q87
    // Cohort retention: users grouped by their first-conversion week, then
    // counted per (cohort, week offset) with the retention fraction
    // against the cohort's own week-0 size. "Conversion" is the sampled
    // purchase stream (event_id % 5) — the raw event stream is so dense on
    // this corpus (every user active every week) that the matrix would be
    // all-1.0; a real retention analysis picks the business event for the
    // same reason. Both engines truncate weeks to Monday and the offsets
    // are exact multiples of 7 days, so the grid aligns; retention is a
    // raw long/long IEEE quotient. Plan: ONE scan — the per-user cohort
    // week is a whole-partition window min (not an agg + self-join, which
    // recomputed the activity subtree per consumer), and the week-0
    // cohort size is a window max over the already-aggregated retention
    // frame (every cohort contains its own offset-0 row), not a self-join
    // against it.
    "q87_cohort_retention" -> QDef(
      (s, d) => {
        val act = events(s, d)
          .where(col("event_type") === "purchase" && col("event_id") % 5 === 0)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val ret = act
          .withColumn("cohort_week", min("wk").over(Window.partitionBy("user_id")))
          .withColumn("week_offset",
            (datediff(col("wk"), col("cohort_week")) / 7).cast("int"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct(col("user_id")).as("n_users"))
        ret
          .withColumn("cohort_size",
            max(when(col("week_offset") === 0, col("n_users")))
              .over(Window.partitionBy("cohort_week")))
          .select(
            col("cohort_week"), col("week_offset"), col("n_users"),
            (col("n_users").cast("double") / col("cohort_size").cast("double"))
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH act AS (SELECT DISTINCT user_id,
        |               CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events
        |             WHERE event_type = 'purchase' AND event_id % 5 = 0),
        |cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM act GROUP BY 1),
        |ret AS (SELECT cohort_week,
        |               CAST(date_diff('day', cohort_week, wk) / 7 AS INTEGER) AS week_offset,
        |               COUNT(DISTINCT a.user_id) AS n_users
        |        FROM act a JOIN cohort c ON a.user_id = c.user_id GROUP BY 1, 2)
        |SELECT r.cohort_week, r.week_offset, r.n_users,
        |       CAST(r.n_users AS DOUBLE) / CAST(b.n_users AS DOUBLE) AS retention
        |FROM ret r JOIN ret b ON r.cohort_week = b.cohort_week AND b.week_offset = 0
        |ORDER BY r.cohort_week, r.week_offset""".stripMargin
    ),

    // ---------------------------------------------------------------- q88
    // Gap-based sessionization, batch form: a session breaks where the
    // same user's gap exceeds 30 minutes (lag → flag → running sum =
    // session id → per-session aggregate). This is s12's batch TWIN — the
    // transformWithState sessionizer emits exactly these rows once the
    // watermark closes each session (StreamingEquivalenceSpec proves it on
    // real events), the same q31↔s2 pairing the other streaming demos
    // have. All windows and the aggregate share the user_id partitioning;
    // ties break on event_id (events carry a unique id). sum_value uses
    // the decimal bridge (order-independent; the 2-decimal money data is
    // tie-free at DECIMAL(18,4)).
    "q88_session_stats" -> QDef(
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 1800000000L // 30 minutes
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
          .withColumn("sid", sum(col("new_sess"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(
            min("ts").as("session_start"), max("ts").as("session_end"),
            count(lit(1)).as("n_events"), graft.Det.dsum(col("value")).as("sum_value"))
          .select("user_id", "session_start", "session_end", "n_events", "sum_value")
          .orderBy("user_id", "session_start")
      },
      s"""WITH g AS (SELECT user_id, ts, event_id, value,
         |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |       THEN 1 ELSE 0 END AS new_sess
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                       ROWS UNBOUNDED PRECEDING) AS sid FROM g)
         |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
         |       COUNT(*) AS n_events, ${graft.Det.sqlDsum("value")} AS sum_value
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin
    ),

    // ---------------------------------------------------------------- q93
    // Z-score anomaly detection: flag events whose value sits more than
    // 3σ from their event-type's mean. Per-type moments come from EXACT
    // decimal sums (value is 2-decimal money data: Σx at DECIMAL(38,4),
    // Σx² at DECIMAL(38,8) — both tie-free), cast to double only at the
    // end; mean/var/std/z are then pure IEEE double arithmetic on
    // identical inputs, so they hash bit-for-bit WITHOUT rounding (sqrt
    // is correctly-rounded by IEEE-754 — it is NOT a libm transcendental,
    // so no rounding bridge is needed). The stats side is |event_types|
    // rows — a broadcast join back onto the events scan; one scan, one
    // shuffle for the aggregate, no window. greatest(var, 0) guards the
    // classic catastrophic-cancellation sliver identically in both
    // engines.
    "q93_anomaly_zscore" -> QDef(
      (s, d) => {
        val dec = col("value").cast("decimal(18,4)")
        val stats = events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(dec).as("sv"),
            sum(dec * dec).as("svv"))
          .withColumn("mean", col("sv").cast("double") / col("n"))
          .withColumn("sd", sqrt(greatest(
            col("svv").cast("double") / col("n") - col("mean") * col("mean"),
            lit(0.0))))
          .select("event_type", "mean", "sd")
        events(s, d)
          .join(broadcast(stats), "event_type")
          .withColumn("z", (col("value") - col("mean")) / col("sd"))
          .where(abs(col("z")) > 3.0)
          .select("event_id", "event_type", "value", "z")
          .orderBy("event_id")
      },
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         SUM(CAST(value AS DECIMAL(18,4))) AS sv,
        |         SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS svv
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type, CAST(sv AS DOUBLE) / n AS mean,
        |         sqrt(greatest(CAST(svv AS DOUBLE) / n
        |               - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)) AS sd
        |  FROM st)
        |SELECT e.event_id, e.event_type, e.value, (e.value - m.mean) / m.sd AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs((e.value - m.mean) / m.sd) > 3
        |ORDER BY e.event_id""".stripMargin
    ),

    // ---------------------------------------------------------------- q94
    // SCD type-2 build from a change log: treat each user's event stream
    // as status changes (status = event_type), collapse consecutive
    // repeats, and emit validity intervals [valid_from, valid_to) with
    // NULL valid_to marking the current row — the standard
    // dimension-table history build. One scan; both windows (the
    // change-detection lag and the interval-closing lead) share the
    // (user_id)×(ts, event_id) partitioning+ordering, so the plan is one
    // user_id exchange + one sort feeding two pipelined WindowExecs.
    // user_id % 7 carves the demo corpus; the plan is per-user-linear so
    // the same shape runs unsampled at scale. (ts, event_id) is a unique
    // order — no tie can flip which row opens an interval.
    "q94_scd2_intervals" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .where(col("user_id") % 7 === 0)
          .withColumn("prev_status", lag("event_type", 1).over(w))
          .where(col("prev_status").isNull || col("prev_status") =!= col("event_type"))
          .withColumn("valid_to", lead("ts", 1).over(w))
          .withColumn("is_current", col("valid_to").isNull)
          .select(col("user_id"), col("event_type").as("status"),
            col("ts").as("valid_from"), col("valid_to"), col("is_current"))
          // total order: same (user, ts, status) can repeat (A-B-A at one
          // ts); is_current then valid_to breaks it — the only NULL
          // valid_to row is the user's single current row, which its
          // is_current key already ordered alone, so NULL ordering
          // differences between engines can never surface
          .orderBy("user_id", "valid_from", "status", "is_current", "valid_to")
      },
      """WITH changes AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_status
        |  FROM events WHERE user_id % 7 = 0),
        |kept AS (
        |  SELECT user_id, event_type, ts, event_id FROM changes
        |  WHERE prev_status IS NULL OR prev_status <> event_type)
        |SELECT user_id, event_type AS status, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM kept
        |ORDER BY user_id, valid_from, status, is_current, valid_to""".stripMargin
    ),

    // ---------------------------------------------------------------- q95
    // Triangle counting on the temporal proximity graph (same-user events
    // pairwise within 6 h) — the graph-analytics step past q66's
    // connected components: triangle density is the standard cohesion/
    // burstiness signal on interaction graphs. Edges come from the q82
    // two-bucket explode equi-join (exactly-once, no inequality
    // nested-loop); nodes are totally ordered by (ts, event_id) so each
    // triangle is counted ONCE in its canonical x<y<z orientation via two
    // (user_id, endpoint) equi-joins over the materialized edge table —
    // the standard distributed triangle enumeration, every join
    // key-partitioned, wedge count bounded by per-user degree (PlanAudit:
    // no nested-loop). Per-user counts, not one global row: the answer a
    // burst detector consumes.
    "q95_triangle_count" -> QDef(
      (s, d) => {
        val W = 21600000000L // 6 h in micros
        val ev = events(s, d).select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        val withB = ev.withColumn("b", expr(s"us DIV $W"))
        val left = withB.select(col("user_id"), col("us").as("us_a"),
          col("event_id").as("ea"), explode(array(col("b"), col("b") + 1)).as("bk"))
        val right = withB.select(col("user_id"), col("us").as("us_b"),
          col("event_id").as("eb"), col("b").as("bk"))
        val edges = left.join(right, Seq("user_id", "bk"))
          .where((col("us_b") > col("us_a") ||
            (col("us_b") === col("us_a") && col("eb") > col("ea"))) &&
            col("us_b") - col("us_a") <= W)
          .select("user_id", "ea", "eb")
          .localCheckpoint() // feeds all three triangle sides
        val e2 = edges.select(col("user_id").as("u2"), col("ea").as("y"), col("eb").as("z"))
        edges
          .join(e2, col("user_id") === col("u2") && col("eb") === col("y"))
          .select(col("user_id"), col("ea").as("x"), col("y"), col("z"))
          .join(edges.select(col("user_id"), col("ea").as("x"), col("eb").as("z")),
            Seq("user_id", "x", "z"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_triangles"))
          .orderBy("user_id")
      },
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |edges AS (
        |  SELECT a.user_id, a.event_id AS ea, b.event_id AS eb
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
        |    AND b.us - a.us <= 21600000000)
        |SELECT e1.user_id, COUNT(*) AS n_triangles
        |FROM edges e1
        |JOIN edges e2 ON e1.user_id = e2.user_id AND e1.eb = e2.ea
        |JOIN edges e3 ON e1.user_id = e3.user_id AND e3.ea = e1.ea AND e3.eb = e2.eb
        |GROUP BY e1.user_id ORDER BY e1.user_id""".stripMargin
    ),

    // ---------------------------------------------------------------- q96
    // Event-transition matrix: per-user consecutive event-type bigrams
    // (the Markov next-event table a recommendation/abuse model trains
    // on), with per-source transition probabilities. One scan, one
    // user_id window (unique (ts, event_id) order), one aggregate; the
    // probability normalizer is a window over the |types|²-row aggregate,
    // partitioned by from_type. Probabilities are raw double quotients of
    // exact int64 counts — never rounded.
    "q96_event_transitions" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .withColumn("to_type", lead("event_type", 1).over(w))
          .where(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", col("n").cast("double") /
            sum("n").over(Window.partitionBy("from_type")).cast("double"))
          .orderBy("from_type", "to_type")
      },
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |agg AS (
        |  SELECT from_type, to_type, COUNT(*) AS n FROM tr
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM agg ORDER BY from_type, to_type""".stripMargin
    ),

    // --------------------------------------------------------------- q100
    // Rolling interval-window aggregates: per event, the count and exact
    // decimal sum of the same user's events in the trailing hour — a
    // RANGE frame over epoch seconds ([t-3599, t], peers included by
    // value), the window feature the ROWS-frame q21 can't express and
    // the per-tick form of q31's tumbling buckets. One scan, one user_id
    // exchange, one sort feeding both frame aggregates. The frame is a
    // pure function of the (integer) second values, so tie handling is
    // identical in both engines; the sum runs in DECIMAL(18,4) (exact,
    // order-free) and casts to double once.
    "q100_rolling_window" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("sec"))
          .rangeBetween(-3599, Window.currentRow)
        events(s, d)
          .withColumn("sec", expr("unix_micros(ts) DIV 1000000"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h",
            round(sum(col("value").cast(graft.Det.D)).over(w), 4).cast("double"))
          .select("user_id", "event_id", "sec", "n_1h", "sum_1h")
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 4) AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
    ),

    // --------------------------------------------------------------- q102
    // Rolling exact distinct users: for every 7-day window end, the exact
    // count of distinct active users and total events in [wend-6, wend] —
    // the DAU/WAU overlap curve. COUNT(DISTINCT) is not window-framable in
    // either engine, so the scale shape is replicate-by-window-length: the
    // (user, day) grain is reduced FIRST (one shuffle, map-side combined —
    // the explode factor applies to the reduced grain, not raw events),
    // each grain row is exploded to the <= 7 window ends it serves, and
    // one (wend)-keyed exact distinct finishes. Cost scales as 7x the
    // user-day grain regardless of raw event volume; the approximate
    // escape hatch at extreme cardinality is q54's HLL, per window.
    "q102_rolling_distinct" -> QDef(
      (s, d) => {
        events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
          .withColumn("wend",
            explode(expr("sequence(day, date_add(day, 6), interval 1 day)")))
          .groupBy("wend")
          .agg(countDistinct(col("user_id")).as("n_users"),
            sum("n").as("n_events"))
          .orderBy("wend")
      },
      """WITH du AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |            FROM events GROUP BY 1, 2),
        |ex AS (SELECT user_id, n, CAST(uns AS DATE) AS wend FROM
        |  (SELECT user_id, n,
        |          unnest(generate_series(day, day + INTERVAL 6 DAY,
        |                                 INTERVAL 1 DAY)) AS uns
        |   FROM du) t)
        |SELECT wend, COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(n) AS BIGINT) AS n_events
        |FROM ex GROUP BY wend ORDER BY wend""".stripMargin
    ),

    // --------------------------------------------------------------- q109
    // Time-weighted average value per user: each event's value holds
    // until the next event (step-function semantics — the metric-series
    // average a monitoring store computes, where arithmetic mean
    // over-weights bursts). One scan, one user_id window (lead), one
    // aggregate. Exactness: value (2-decimal data) enters the
    // DECIMAL(18,4) bridge, durations are exact int64 seconds, so every
    // value·duration product and their sum are EXACT decimals on both
    // engines; the only float op is the final decimal→double cast and one
    // raw IEEE division by the span. Single-event users have no span and
    // are excluded (both engines agree by construction).
    "q109_time_weighted_avg" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        events(s, d)
          .withColumn("sec", expr("unix_micros(ts) DIV 1000000"))
          .withColumn("next_sec", lead("sec", 1).over(w))
          .where(col("next_sec").isNotNull)
          .groupBy("user_id")
          .agg(
            sum(col("value").cast(graft.Det.D) * (col("next_sec") - col("sec")))
              .cast("double").as("weighted_sum"),
            (max("next_sec") - min("sec")).as("span_s"))
          .withColumn("twa", col("weighted_sum") / col("span_s").cast("double"))
          .select("user_id", "span_s", "twa")
          .orderBy("user_id")
      },
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_id,
        |                   value FROM events),
        |seg AS (SELECT user_id, sec, value,
        |          lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |            AS next_sec
        |        FROM ev)
        |SELECT user_id,
        |       CAST(MAX(next_sec) - MIN(sec) AS BIGINT) AS span_s,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4)) * (next_sec - sec)) AS DOUBLE)
        |         / CAST(MAX(next_sec) - MIN(sec) AS DOUBLE) AS twa
        |FROM seg WHERE next_sec IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q110
    // Last-touch attribution: every purchase is credited to the nearest
    // PRECEDING non-purchase event of the same user (the marketing
    // attribution rule), with per-channel purchase counts and share.
    // One scan, one user_id window: a conditional last_value(...) IGNORE
    // NULLS carries the most recent non-purchase type forward, the filter
    // keeps purchases, one aggregate finishes. Purchases with no prior
    // touch credit 'none'. Share is one raw IEEE division of exact int64
    // counts by the (broadcast) 1-row total.
    "q110_attribution" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val attributed = events(s, d)
          .withColumn("sec", expr("unix_micros(ts) DIV 1000000"))
          .withColumn("touch",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(coalesce(col("touch"), lit("none")).as("channel"))
        val counts = attributed.groupBy("channel").agg(count(lit(1)).as("n"))
        counts
          .crossJoin(broadcast(attributed.agg(count(lit(1)).as("total"))))
          .select(col("channel"), col("n"),
            (col("n").cast("double") / col("total").cast("double")).as("share"))
          .orderBy("channel")
      },
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_id,
        |                   event_type FROM events),
        |t AS (SELECT user_id, event_type,
        |        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |          IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |      FROM ev),
        |a AS (SELECT COALESCE(touch, 'none') AS channel FROM t
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT channel, COUNT(*) AS n FROM a GROUP BY 1)
        |SELECT channel, n,
        |       CAST(n AS DOUBLE) / CAST((SELECT COUNT(*) FROM a) AS DOUBLE) AS share
        |FROM c ORDER BY channel""".stripMargin
    )
  )
}

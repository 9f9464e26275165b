package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-9 fifth wave — the daily platform workloads: experimentation
  * (q146 A/B readout, q151 decile lift, q152 time-to-convert),
  * operations (q147 freshness audit), CEP with negation (q148), the
  * widest-path semiring step (q149), the quantile sketch-audit (q150),
  * and frame-edge window functions (q153).
  *
  * Reference provenance: N/A (empty checkout, SURVEY.md §0).
  */
object Round9e {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q146
    // A/B experiment readout: users hash-assign to two variants (the
    // house multiplicative family — assignment is a pure function of the
    // key, reproducible across reruns, the property experiment platforms
    // require), user-level conversion = any purchase over $150, and the
    // readout is the two-proportion pooled z statistic. All counts are
    // exact int64; rates and z are raw IEEE expressions of identical
    // shape on both engines. Degenerate experiments (all or none
    // converted — z undefined) are excluded by EXACT integer compare, so
    // the query is total at any SF. Scale shape: one map-side-combinable
    // per-user aggregate, a 2-row variant rollup, a 1-row pivot — the
    // whole readout is one shuffle over user keys.
    "q146_ab_test" -> QDef(
      (s, d) => {
        val assign = events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" && col("value") > 150, 1L)
            .otherwise(0L)).as("converted"))
          .withColumn("variant", col("user_id") * 7919 % 104729 % 2)
        val v = assign.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum("converted").as("c"))
        val w = v.agg(
          max(when(col("variant") === 0, col("n"))).as("n0"),
          max(when(col("variant") === 0, col("c"))).as("c0"),
          max(when(col("variant") === 1, col("n"))).as("n1"),
          max(when(col("variant") === 1, col("c"))).as("c1"))
        val p = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")).cast("double")
        w.where(col("c0") + col("c1") > 0 && col("c0") + col("c1") < col("n0") + col("n1"))
          .select(col("n0"), col("c0"), col("n1"), col("c1"),
            (col("c0").cast("double") / col("n0").cast("double")).as("rate0"),
            (col("c1").cast("double") / col("n1").cast("double")).as("rate1"),
            ((col("c1").cast("double") / col("n1").cast("double")
              - col("c0").cast("double") / col("n0").cast("double"))
              / sqrt(p * (lit(1) - p)
                * (lit(1) / col("n0").cast("double") + lit(1) / col("n1").cast("double"))))
              .as("z"))
      },
      """WITH assign AS (
        |  SELECT user_id, user_id * 7919 % 104729 % 2 AS variant,
        |         max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1),
        |v AS (SELECT variant, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS c
        |      FROM assign GROUP BY 1),
        |w AS (SELECT
        |        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        |        MAX(CASE WHEN variant = 0 THEN c END) AS c0,
        |        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        |        MAX(CASE WHEN variant = 1 THEN c END) AS c1
        |      FROM v)
        |SELECT n0, c0, n1, c1,
        |       CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
        |       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
        |       (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |          - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |         / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |                * (1 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |                * (1 / CAST(n0 AS DOUBLE) + 1 / CAST(n1 AS DOUBLE))) AS z
        |FROM w
        |WHERE c0 + c1 > 0 AND c0 + c1 < n0 + n1""".stripMargin
    ),

    // --------------------------------------------------------------- q147
    // Data-freshness audit: per event type, the lag of its newest record
    // behind the table's global high-water mark, and the fraction of its
    // rows older than a 7-day staleness horizon — the data-ops dashboard
    // row that catches a stalled upstream producer (the ingest-side
    // sibling of q108's referential audit and q129's snapshot diff). All
    // arithmetic is exact int64 micros; stale_frac is one raw quotient.
    // Scale shape: ONE scan computes every per-type aggregate (the global
    // max rides a 1-row broadcast back over the 5-row type table, not
    // over the data).
    "q147_freshness_audit" -> QDef(
      (s, d) => {
        val ev = events(s, d).select(col("event_type"), unix_micros(col("ts")).as("us"))
        val g = ev.agg(max("us").as("gmax"))
        ev.crossJoin(broadcast(g))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("us").as("tmax"),
            sum(when(col("us") < col("gmax") - 604800000000L, 1L).otherwise(0L))
              .as("n_stale"),
            max("gmax").as("gmax"))
          .select(col("event_type"), col("n"), col("tmax"),
            (col("gmax") - col("tmax")).as("lag_us"),
            (col("n_stale").cast("double") / col("n").cast("double")).as("stale_frac"))
          .orderBy("event_type")
      },
      """WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events),
        |t AS (SELECT event_type, COUNT(*) AS n, max(epoch_us(ts)) AS tmax,
        |             CAST(SUM(CASE WHEN epoch_us(ts) < g.gmax - 604800000000
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
        |             g.gmax AS gmax
        |      FROM events, g GROUP BY 1, g.gmax)
        |SELECT event_type, n, tmax, gmax - tmax AS lag_us,
        |       CAST(n_stale AS DOUBLE) / CAST(n AS DOUBLE) AS stale_frac
        |FROM t ORDER BY event_type""".stripMargin
    ),

    // --------------------------------------------------------------- q148
    // CEP with NEGATION: click → purchase with NO error between — the
    // pattern class q38/s4's two-step detector cannot express (negative
    // conditions are what separate MATCH_RECOGNIZE-style CEP from plain
    // sequence joins). Each purchase row reads two running conditional
    // maxima over the strictly-preceding user timeline (last click, last
    // error); the path is clean iff a click exists and no error follows
    // it. ONE keyed window over (ts, event_id) order computes both —
    // single user_id shuffle, partitions bounded by per-user activity,
    // no self-join of the event table against itself. All comparisons
    // exact int64 micros.
    "q148_pattern_negation" -> QDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("last_click",
            max(when(col("event_type") === "click", col("us"))).over(w))
          .withColumn("last_error",
            max(when(col("event_type") === "error", col("us"))).over(w))
          .where(col("event_type") === "purchase")
          .select(col("user_id"),
            when(col("last_click").isNotNull &&
              (col("last_error").isNull || col("last_error") < col("last_click")), 1L)
              .otherwise(0L).as("matched"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_purchases"), sum("matched").as("n_clean_paths"))
          .where(col("n_clean_paths") > 0)
          .orderBy("user_id")
      },
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |w AS (SELECT user_id, event_id, event_type, us,
        |             max(us) FILTER (WHERE event_type = 'click') OVER win AS last_click,
        |             max(us) FILTER (WHERE event_type = 'error') OVER win AS last_error
        |      FROM e
        |      WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT user_id,
        |             CASE WHEN last_click IS NOT NULL
        |                   AND (last_error IS NULL OR last_error < last_click)
        |                  THEN 1 ELSE 0 END AS matched
        |      FROM w WHERE event_type = 'purchase')
        |SELECT user_id, COUNT(*) AS n_purchases,
        |       CAST(SUM(matched) AS BIGINT) AS n_clean_paths
        |FROM m GROUP BY 1 HAVING CAST(SUM(matched) AS BIGINT) > 0
        |ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q149
    // Semiring graph step — widest (max-min) 2-hop path over the event-
    // transition graph: W₂(a,c) = max_b min(w(a,b), w(b,c)), the
    // bottleneck-capacity relaxation that shortest-path/PageRank (plus-
    // times and min-plus, q103) can't express; one step of the min-max
    // closure a capacity-planning analysis iterates. The transition
    // graph comes from q96's keyed lead window; the semiring "matrix
    // product" is an equi-join on the middle vertex + a max-min rollup.
    // Scale shape: the edge table is |types|² rows at ANY volume (the
    // data-sized work is the one keyed window building it), so the join
    // is broadcast-tiny; argmax via made total by (width DESC, via ASC).
    "q149_widest_path" -> QDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("a"))
          .withColumn("b", lead("a", 1).over(w))
          .where(col("b").isNotNull)
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
        val hop2 = edges.as("e1")
          .join(broadcast(edges.as("e2")), col("e1.b") === col("e2.a"))
          .select(col("e1.a").as("src"), col("e2.b").as("dst"),
            col("e1.b").as("via"), least(col("e1.w"), col("e2.w")).as("width"))
        val rk = org.apache.spark.sql.expressions.Window
          .partitionBy("src", "dst").orderBy(col("width").desc, col("via"))
        hop2.withColumn("rk", row_number().over(rk)).where(col("rk") === 1)
          .join(edges.select(col("a").as("src"), col("b").as("dst"),
            col("w").as("direct_w")), Seq("src", "dst"), "left")
          .select("src", "dst", "direct_w", "width", "via")
          .withColumnRenamed("width", "two_hop_width")
          .orderBy("src", "dst")
      },
      """WITH seq AS (
        |  SELECT user_id, event_type AS a,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        |  FROM events),
        |edges AS (SELECT a, b, COUNT(*) AS w FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
        |hop2 AS (
        |  SELECT e1.a AS src, e2.b AS dst, e1.b AS via,
        |         CASE WHEN e1.w < e2.w THEN e1.w ELSE e2.w END AS width
        |  FROM edges e1 JOIN edges e2 ON e1.b = e2.a),
        |best AS (
        |  SELECT src, dst, via, width,
        |         ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY width DESC, via) AS rk
        |  FROM hop2)
        |SELECT b.src, b.dst, d.w AS direct_w, b.width AS two_hop_width, b.via
        |FROM best b LEFT JOIN edges d ON d.a = b.src AND d.b = b.dst
        |WHERE b.rk = 1 ORDER BY b.src, b.dst""".stripMargin
    ),

    // --------------------------------------------------------------- q150
    // Histogram-median accuracy audit — the quantile member of the
    // sketch-audit family (bloom q79, CMS q122, heavy-hitters q127, LSH
    // recall q83): estimate the median from a 100-bin equi-width
    // coarsening of the exact per-cent count table (linear interpolation
    // inside the median bin — exactly how engines answer quantiles from
    // column statistics), next to the EXACT median, with the structural
    // bound |err| < bin width (both the exact median and the estimate
    // lie in the same bin — InvariantSpec locks it). Scale shape: one
    // per-cent pre-aggregate; the exact side runs the bucketed Scan
    // cumulative; the coarse side's window covers only the ≤100-row bin
    // table (bounded by the cent domain, the q105 argument). At 100 TB
    // the audit costs one aggregate — the coarse summary IS what a
    // stats catalog stores, and this query measures what that storage
    // decision gives up.
    "q150_hist_median_audit" -> QDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byv = events(s, d)
          .select((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("v"))
          .groupBy("v").agg(count(lit(1)).as("cnt"))
        val need = byv.agg(sum("cnt").as("n"))
          .select(expr("(n + 1) DIV 2").as("k"), col("n"))
        val cum = Scan.runningSumByRange(byv, col("v"), col("v"), col("cnt"), "cx",
          lo = 0L, hi = 49100L)
        val exact = cum.crossJoin(broadcast(need))
          .where(col("cx") + col("cnt") >= col("k"))
          .agg(min("v").as("exact_med"))
        val bins = byv.withColumn("bin", expr("v DIV 500"))
          .groupBy("bin").agg(sum("cnt").as("bc"))
        val wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
        val bcum = bins.withColumn("bcx", coalesce(sum("bc").over(wb), lit(0L)))
        val mbin = bcum.crossJoin(broadcast(need))
          .where(col("bcx") + col("bc") >= col("k"))
          .agg(min("bin").as("mbin"))
        val est = bcum.crossJoin(broadcast(need))
          .join(broadcast(mbin), col("bin") === col("mbin"))
          .select((col("bin") * 500 +
            (col("k") - col("bcx")).cast("double") / col("bc").cast("double") * 500)
            .as("est_med"))
        exact.crossJoin(est)
          .select(col("exact_med"), col("est_med"),
            abs(col("est_med") - col("exact_med").cast("double")).as("abs_err"),
            lit(500L).as("bound_cents"))
      },
      """WITH e AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM events),
        |byv AS (SELECT v, COUNT(*) AS cnt FROM e GROUP BY 1),
        |tots AS (SELECT SUM(cnt) AS n FROM byv),
        |cum AS (SELECT v, cnt,
        |               COALESCE(SUM(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cx
        |        FROM byv),
        |need AS (SELECT (n + 1) // 2 AS k, n FROM tots),
        |exact AS (SELECT min(v) AS exact_med FROM cum, need WHERE cx + cnt >= k),
        |bins AS (SELECT v // 500 AS bin, SUM(cnt) AS bc FROM byv GROUP BY 1),
        |bcum AS (SELECT bin, bc,
        |                COALESCE(SUM(bc) OVER (ORDER BY bin
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bcx
        |         FROM bins),
        |mbin AS (SELECT min(bin) AS mbin FROM bcum, need WHERE bcx + bc >= k),
        |est AS (SELECT b.bin * 500
        |               + CAST(need.k - b.bcx AS DOUBLE)
        |                 / CAST(b.bc AS DOUBLE) * 500 AS est_med
        |        FROM bcum b JOIN mbin ON b.bin = mbin.mbin, need)
        |SELECT exact.exact_med, est.est_med,
        |       abs(est.est_med - CAST(exact.exact_med AS DOUBLE)) AS abs_err,
        |       CAST(500 AS BIGINT) AS bound_cents
        |FROM exact, est""".stripMargin
    ),

    // --------------------------------------------------------------- q151
    // Decile lift (gains) table — THE model-evaluation query: rank users
    // by a score (here activity volume), split into ranked deciles, and
    // report each decile's conversion rate against the base rate. The
    // ranking never sorts the users globally: per-score counts cumulate
    // through the bucketed Scan (score domain descending via the
    // order-flip 100000−score; per-user event counts stay far below that
    // at any test SF — at true 100 TB widen the constant with the
    // domain), decile = floor(cum_before·10/n) on exact integers, and
    // the rollup is 10 rows. Rates/lift are raw IEEE quotients of exact
    // counts with identical association.
    "q151_decile_lift" -> QDef(
      (s, d) => {
        val u = events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("score"),
            max(when(col("event_type") === "purchase" && col("value") > 150, 1L)
              .otherwise(0L)).as("conv"))
        val tots = u.agg(count(lit(1)).as("n"), sum("conv").as("tc"))
        val bys = u.groupBy("score")
          .agg(count(lit(1)).as("cnt"), sum("conv").as("cc"))
          .withColumn("ord", lit(100000L) - col("score"))
        val cum = Scan.runningSumByRange(bys, col("ord"), col("ord"), col("cnt"), "cx",
          lo = 0L, hi = 100000L)
        cum.crossJoin(broadcast(tots))
          .withColumn("decile", expr("cx * 10 DIV n"))
          .groupBy("decile")
          .agg(sum("cnt").as("n_users"), sum("cc").as("n_conv"),
            max("tc").as("tc"), max("n").as("n"))
          .select(col("decile"), col("n_users"), col("n_conv"),
            (col("n_conv").cast("double") / col("n_users").cast("double")).as("conv_rate"),
            ((col("n_conv").cast("double") / col("n_users").cast("double"))
              / (col("tc").cast("double") / col("n").cast("double"))).as("lift"))
          .orderBy("decile")
      },
      """WITH u AS (
        |  SELECT user_id, COUNT(*) AS score,
        |         max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |tots AS (SELECT COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS tc FROM u),
        |bys AS (SELECT score, COUNT(*) AS cnt, CAST(SUM(conv) AS BIGINT) AS cc
        |        FROM u GROUP BY 1),
        |cum AS (SELECT score, cnt, cc,
        |               COALESCE(SUM(cnt) OVER (ORDER BY 100000 - score
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cx
        |        FROM bys),
        |dec AS (SELECT CAST(cx * 10 // n AS BIGINT) AS decile, cnt, cc, tc, n
        |        FROM cum, tots),
        |agg AS (SELECT decile, CAST(SUM(cnt) AS BIGINT) AS n_users,
        |               CAST(SUM(cc) AS BIGINT) AS n_conv,
        |               MAX(tc) AS tc, MAX(n) AS n
        |        FROM dec GROUP BY 1)
        |SELECT decile, n_users, n_conv,
        |       CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
        |       (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |         / (CAST(tc AS DOUBLE) / CAST(n AS DOUBLE)) AS lift
        |FROM agg ORDER BY decile""".stripMargin
    ),

    // --------------------------------------------------------------- q152
    // Time-to-convert percentiles by acquisition cohort — duration
    // analytics (the latency-distribution readout of q85's funnel): per
    // user, first click → first subsequent purchase, then exact
    // interpolated p50/p90 of the conversion lag per first-click cohort
    // week. Durations are exact int64 micro differences; percentile/
    // quantile_cont agree at these magnitudes (the q55 discipline,
    // re-verified by the oracle gate at both SFs). Scale shape: one
    // type-pruned scan per side, one user-keyed equi-join, one cohort
    // rollup — per-user state is two timestamps, never an event list.
    "q152_time_to_convert" -> QDef(
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"),
          col("ts"), unix_micros(col("ts")).as("us"))
        val fc = ev.where(col("event_type") === "click")
          .groupBy("user_id").agg(min("us").as("fc_us"), min("ts").as("fc_ts"))
        val fp = ev.where(col("event_type") === "purchase")
          .join(fc, "user_id")
          .where(col("us") > col("fc_us"))
          .groupBy("user_id", "fc_us", "fc_ts")
          .agg(min("us").as("fp_us"))
        fp.select(to_date(date_trunc("week", col("fc_ts"))).as("cohort_week"),
            (col("fp_us") - col("fc_us")).as("dur_us"))
          .groupBy("cohort_week")
          .agg(count(lit(1)).as("n_users"),
            expr("percentile(dur_us, 0.5)").as("median_us"),
            expr("percentile(dur_us, 0.9)").as("p90_us"))
          .orderBy("cohort_week")
      },
      """WITH fc AS (
        |  SELECT user_id, min(epoch_us(ts)) AS fc_us, min(ts) AS fc_ts
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |fp AS (
        |  SELECT e.user_id, fc.fc_us, fc.fc_ts, min(epoch_us(e.ts)) AS fp_us
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fc.fc_us
        |  GROUP BY 1, 2, 3)
        |SELECT date_trunc('week', fc_ts) AS cohort_week,
        |       COUNT(*) AS n_users,
        |       quantile_cont(fp_us - fc_us, 0.5) AS median_us,
        |       quantile_cont(fp_us - fc_us, 0.9) AS p90_us
        |FROM fp GROUP BY 1 ORDER BY cohort_week""".stripMargin
    ),

    // --------------------------------------------------------------- q153
    // Frame-edge window functions — first_value / nth_value / last_value
    // over the FULL partition frame (unbounded preceding → unbounded
    // following), the session-bookend readout ("how did each user's
    // journey start, continue, end?") and the last window-function
    // family the inventory didn't exercise (q20–q24 cover rank/frame/
    // lag/ntile; q86/q110 use last_value IGNORE NULLS). One keyed
    // window, one row kept per user via rn = 1 — the window shuffles
    // user-bounded partitions once, nothing global.
    "q153_window_edges" -> QDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val full = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("first_type", first("event_type").over(full))
          .withColumn("last_type", last("event_type").over(full))
          .withColumn("second_type", expr("nth_value(event_type, 2)").over(full))
          .withColumn("n_events", count(lit(1)).over(full))
          .withColumn("rn", row_number().over(seq))
          .where(col("rn") === 1)
          .select("user_id", "first_type", "second_type", "last_type", "n_events")
          .orderBy("user_id")
      },
      """WITH w AS (
        |  SELECT user_id,
        |         first_value(event_type) OVER win AS first_type,
        |         last_value(event_type) OVER win AS last_type,
        |         nth_value(event_type, 2) OVER win AS second_type,
        |         COUNT(*) OVER win AS n_events,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_type, second_type, last_type, n_events
        |FROM w WHERE rn = 1 ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q154
    // Source-concentration audit — per-language Herfindahl index over
    // document sources plus the top-source share: the corpus-diversity
    // metric a curation pipeline reads next to q74's mix weights (q74
    // computes target proportions; this flags when one source DOMINATES
    // a language and resampling is needed). All-integer HHI: counts are
    // exact int64, Σcnt² and (Σcnt)² stay far below 2^53 so every
    // double cast is portable (the q116 bound), and hhi/top_share are
    // raw IEEE quotients of identical shape. Scale shape: two map-side-
    // combinable aggregates, output bounded by the language count.
    "q154_source_concentration" -> QDef(
      (s, d) => {
        documents(s, d).groupBy("lang", "source").agg(count(lit(1)).as("cnt"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sources"), sum("cnt").as("n_docs"),
            sum(col("cnt") * col("cnt")).as("ss"), max("cnt").as("mx"))
          .select(col("lang"), col("n_sources"), col("n_docs"),
            (col("ss").cast("double") /
              (col("n_docs") * col("n_docs")).cast("double")).as("hhi"),
            (col("mx").cast("double") / col("n_docs").cast("double")).as("top_share"))
          .orderBy("lang")
      },
      """WITH g AS (SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY 1, 2)
        |SELECT lang, COUNT(*) AS n_sources, CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |       CAST(SUM(cnt * cnt) AS DOUBLE)
        |         / CAST(CAST(SUM(cnt) AS BIGINT) * CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS hhi,
        |       CAST(MAX(cnt) AS DOUBLE) / CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS top_share
        |FROM g GROUP BY 1 ORDER BY lang""".stripMargin
    )
  )
}

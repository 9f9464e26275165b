package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 11: statistics + curation depth — linear-interpolation
  * gap fill (q193, the interior-estimate complement of q86's
  * step/forward fill), Cohen's kappa inter-labeler agreement (q194, the
  * label-quality gate for annotation pipelines), categorical mutual
  * information (q195, the redundancy/leakage screen between metadata
  * columns), lead–lag cross-correlation (q196, the "which metric leads
  * which" complement of q125's autocorrelation), largest-remainder quota
  * apportionment (q197, exact integer allocation of a sample budget
  * across strata — the allocation step q69/q76's samplers consume), and
  * the repeated-n-gram memorization audit (q198, the cross-corpus
  * complement of q188's benchmark-overlap decontamination).
  *
  * Determinism: counts and hour indexes are exact int64; every reported
  * ratio/statistic is ONE identically-spelled double expression over
  * exact integers (raw IEEE, never rounded — CLAUDE.md); the one
  * transcendental (q195's ln) is rounded per-row to 4 decimals, the q134
  * discipline; division-by-zero edges are explicit CASEs in BOTH engines.
  */
object Round10k {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q193
    // Linear-interpolation gap fill: the same hourly per-user grid as q86,
    // but interior gaps are linearly interpolated between the bracketing
    // observations instead of step-filled (edges stay NULL — no
    // extrapolation). Scale shape: identical to q86 — per-user windows
    // (PARTITIONED, never global), grid explode bounded by the observed
    // time range; the carry windows are running first/last over each user
    // partition. The interpolation fraction is a quotient of exact
    // timestampdiff hour integers; pv + (nv−pv)·frac is raw IEEE over
    // identical inputs in both engines.
    "q193_linear_interp" -> QDef(
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
        val back = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        grid.join(obs, Seq("user_id", "hr"), "left")
          .select(col("user_id"), col("hr"), col("value"),
            last(col("value"), ignoreNulls = true).over(back).as("pv"),
            last(when(col("value").isNotNull, col("hr")), ignoreNulls = true)
              .over(back).as("ph"),
            first(col("value"), ignoreNulls = true).over(fwd).as("nv"),
            first(when(col("value").isNotNull, col("hr")), ignoreNulls = true)
              .over(fwd).as("nh"))
          .select(col("user_id"), col("hr"),
            col("value").isNotNull.cast("int").as("had_obs"),
            when(col("value").isNotNull, col("value"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                col("pv") + (col("nv") - col("pv")) *
                  (expr("CAST(timestampdiff(HOUR, ph, hr) AS DOUBLE)") /
                    expr("timestampdiff(HOUR, ph, nh)")))
              .otherwise(lit(null).cast("double")).as("v_interp"))
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
        |               FROM obs GROUP BY 1)),
        |w AS (SELECT g.user_id, g.hr, o.value,
        |             last_value(o.value IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.hr
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |             last_value(CASE WHEN o.value IS NOT NULL THEN g.hr END
        |                        IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.hr
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |             first_value(o.value IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.hr
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |             first_value(CASE WHEN o.value IS NOT NULL THEN g.hr END
        |                         IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.hr
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |      FROM grid g LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND g.hr = o.hr)
        |SELECT user_id, hr, CAST(value IS NOT NULL AS INTEGER) AS had_obs,
        |       CASE WHEN value IS NOT NULL THEN value
        |            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |              pv + (nv - pv) *
        |                (CAST(date_diff('hour', ph, hr) AS DOUBLE)
        |                   / date_diff('hour', ph, nh))
        |            ELSE NULL END AS v_interp
        |FROM w ORDER BY user_id, hr""".stripMargin
    ),

    // --------------------------------------------------------------- q194
    // Cohen's kappa inter-labeler agreement: two deterministic rule
    // labelers over the corpus (A: token count ≥ 40; B: n_chars ≥ 240 —
    // correlated views of "long doc", the annotation-QA fixture), the
    // 2×2 confusion table from ONE conditional-aggregation pass (the
    // q187 shape: no join, map-side combinable, one output row at any
    // corpus size), then po/pe/kappa as identically-spelled double
    // expressions over the exact counts. The guard CASE handles the
    // degenerate pe = 1 corpus explicitly in both engines.
    "q194_cohen_kappa" -> QDef(
      (s, d) => {
        val t = documents(s, d).select(
          (size(split(col("text"), " ")) >= 40).cast("int").as("la"),
          (col("n_chars") >= 240).cast("int").as("lb"))
        t.agg(
            count(lit(1)).as("n"),
            sum(when(col("la") === 1 && col("lb") === 1, 1L).otherwise(0L)).as("n11"),
            sum(when(col("la") === 1 && col("lb") === 0, 1L).otherwise(0L)).as("n10"),
            sum(when(col("la") === 0 && col("lb") === 1, 1L).otherwise(0L)).as("n01"),
            sum(when(col("la") === 0 && col("lb") === 0, 1L).otherwise(0L)).as("n00"))
          .withColumn("po", (col("n11") + col("n00")).cast("double") / col("n"))
          .withColumn("pa", (col("n11") + col("n10")).cast("double") / col("n"))
          .withColumn("pb", (col("n11") + col("n01")).cast("double") / col("n"))
          .withColumn("pe",
            col("pa") * col("pb") + (lit(1.0) - col("pa")) * (lit(1.0) - col("pb")))
          .withColumn("kappa",
            when(lit(1.0) - col("pe") === 0.0, lit(null).cast("double"))
              .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))))
          .select("n", "n11", "n10", "n01", "n00", "po", "pe", "kappa")
      },
      """WITH c AS (
        |  SELECT COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN la = 1 AND lb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |         CAST(SUM(CASE WHEN la = 1 AND lb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |         CAST(SUM(CASE WHEN la = 0 AND lb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |         CAST(SUM(CASE WHEN la = 0 AND lb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
        |  FROM (SELECT CAST(len(string_split(text, ' ')) >= 40 AS INTEGER) AS la,
        |               CAST(n_chars >= 240 AS INTEGER) AS lb
        |        FROM documents)),
        |p AS (SELECT n, n11, n10, n01, n00,
        |             CAST(n11 + n00 AS DOUBLE) / n AS po,
        |             CAST(n11 + n10 AS DOUBLE) / n AS pa,
        |             CAST(n11 + n01 AS DOUBLE) / n AS pb
        |      FROM c),
        |q AS (SELECT *, pa * pb + (1.0 - pa) * (1.0 - pb) AS pe FROM p)
        |SELECT n, n11, n10, n01, n00, po, pe,
        |       CASE WHEN 1.0 - pe = 0.0 THEN NULL
        |            ELSE (po - pe) / (1.0 - pe) END AS kappa
        |FROM q""".stripMargin
    ),

    // --------------------------------------------------------------- q195
    // Categorical mutual information between lang and source — the
    // metadata redundancy/leakage screen (is `source` informative about
    // `lang`? then stratifying on one leaks the other). Reported per
    // cell: exact joint/marginal counts, the raw joint probability, and
    // pointwise MI = ln(n_xy·n / (n_x·n_y)) rounded per-row to 4
    // decimals (the q134 transcendental discipline; the ln argument is a
    // quotient of exact int64 products — identical doubles both engines).
    // Scale shape: three map-side-combinable aggregations whose outputs
    // are value-domain-bounded (≤ langs×sources cells), marginals
    // broadcast, 1-row total crossed (bounded build). The total MI is
    // Σ p_xy·pmi over the ≤100-cell result — left to the reader to keep
    // the output free of cross-engine double-sum ordering.
    "q195_mutual_info" -> QDef(
      (s, d) => {
        val cells = documents(s, d).groupBy("lang", "source")
          .agg(count(lit(1)).as("n_xy"))
        val mx = cells.groupBy("lang").agg(sum("n_xy").as("n_x"))
        val my = cells.groupBy("source").agg(sum("n_xy").as("n_y"))
        val nn = cells.agg(sum("n_xy").as("n"))
        cells.join(broadcast(mx), "lang").join(broadcast(my), "source")
          .crossJoin(broadcast(nn))
          .select(col("lang"), col("source"), col("n_xy"), col("n_x"),
            col("n_y"), col("n"),
            (col("n_xy").cast("double") / col("n")).as("p_xy"),
            round(log((col("n_xy") * col("n")).cast("double") /
              (col("n_x") * col("n_y")).cast("double")), 4).as("pmi"))
          .orderBy("lang", "source")
      },
      """WITH cells AS (SELECT lang, source, COUNT(*) AS n_xy
        |               FROM documents GROUP BY 1, 2),
        |mx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1),
        |my AS (SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cells)
        |SELECT c.lang, c.source, c.n_xy, mx.n_x, my.n_y, nn.n,
        |       CAST(c.n_xy AS DOUBLE) / nn.n AS p_xy,
        |       ROUND(ln(CAST(c.n_xy * nn.n AS DOUBLE) /
        |                CAST(mx.n_x * my.n_y AS DOUBLE)), 4) AS pmi
        |FROM cells c JOIN mx ON c.lang = mx.lang
        |             JOIN my ON c.source = my.source
        |             CROSS JOIN nn
        |ORDER BY c.lang, c.source""".stripMargin
    ),

    // --------------------------------------------------------------- q196
    // Lead–lag cross-correlation: Pearson r between hourly click counts
    // at hour t and purchase counts at hour t+lag, for lag ∈ [−6, +6] —
    // "does one metric lead the other", the pair-series complement of
    // q125's single-series autocorrelation. Hours are exact integer
    // indexes (timestampdiff from a fixed anchor — no epoch/timezone
    // arithmetic to drift); each per-lag Pearson flows from six exact
    // int64 sums; r is one identically-spelled double expression with
    // IEEE-exact sqrt, CASE-guarded for zero variance. Scale shape: two
    // pushdown-filtered scans aggregate to hour granularity (map-side
    // combinable, output = O(hours) regardless of event volume); the
    // 13-lag explode fans out the HOUR table, not the data; the per-lag
    // rollup is value-domain-bounded (13 rows). Overlap semantics:
    // observed-hours inner join (this corpus has every hour populated).
    "q196_xcorr_lag" -> QDef(
      (s, d) => {
        val hidx = expr(
          "timestampdiff(HOUR, timestamp'2024-01-01 00:00:00', date_trunc('hour', ts))")
        val ev = events(s, d)
        val a = ev.where(col("event_type") === "click")
          .select(hidx.as("h")).groupBy("h").agg(count(lit(1)).as("cx"))
        val b = ev.where(col("event_type") === "purchase")
          .select(hidx.as("h")).groupBy("h").agg(count(lit(1)).as("cy"))
        a.select(col("h"), col("cx"), explode(expr("sequence(-6, 6)")).as("lag"))
          .join(b.withColumnRenamed("h", "hb"),
            col("h") + col("lag") === col("hb"))
          .groupBy("lag")
          .agg(count(lit(1)).as("n_hours"),
            sum("cx").as("sx"), sum("cy").as("sy"),
            sum(col("cx") * col("cy")).as("sxy"),
            sum(col("cx") * col("cx")).as("sxx"),
            sum(col("cy") * col("cy")).as("syy"))
          .select(col("lag"), col("n_hours"),
            when((col("n_hours") * col("sxx") - col("sx") * col("sx")) === 0 ||
              (col("n_hours") * col("syy") - col("sy") * col("sy")) === 0,
              lit(null).cast("double"))
              .otherwise(
                (col("n_hours") * col("sxy") - col("sx") * col("sy")).cast("double") /
                  (sqrt((col("n_hours") * col("sxx") - col("sx") * col("sx"))
                    .cast("double")) *
                    sqrt((col("n_hours") * col("syy") - col("sy") * col("sy"))
                      .cast("double")))).as("r"))
          .orderBy("lag")
      },
      """WITH a AS (SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
        |                            date_trunc('hour', ts)) AS h,
        |                  COUNT(*) AS cx
        |           FROM events WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
        |                       date_trunc('hour', ts)) AS h,
        |             COUNT(*) AS cy
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |al AS (SELECT a.h, a.cx, l.lag FROM a
        |       CROSS JOIN (SELECT CAST(unnest(generate_series(-6, 6)) AS INTEGER)
        |                     AS lag) l),
        |g AS (SELECT al.lag, COUNT(*) AS n_hours,
        |             CAST(SUM(al.cx) AS BIGINT) AS sx,
        |             CAST(SUM(b.cy) AS BIGINT) AS sy,
        |             CAST(SUM(al.cx * b.cy) AS BIGINT) AS sxy,
        |             CAST(SUM(al.cx * al.cx) AS BIGINT) AS sxx,
        |             CAST(SUM(b.cy * b.cy) AS BIGINT) AS syy
        |      FROM al JOIN b ON al.h + al.lag = b.h
        |      GROUP BY 1)
        |SELECT lag, n_hours,
        |       CASE WHEN n_hours * sxx - sx * sx = 0
        |              OR n_hours * syy - sy * sy = 0 THEN NULL
        |            ELSE CAST(n_hours * sxy - sx * sy AS DOUBLE) /
        |                 (sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE)) *
        |                  sqrt(CAST(n_hours * syy - sy * sy AS DOUBLE)))
        |       END AS r
        |FROM g ORDER BY lag""".stripMargin
    ),

    // --------------------------------------------------------------- q197
    // Largest-remainder (Hamilton) quota apportionment: allocate an
    // exact sample budget N = 10000 across (lang, source) strata
    // proportional to document counts — floor quotas first, then the
    // leftover seats to the largest remainders (deterministic tie-break
    // by lang, source). The allocation step q69/q76's samplers consume;
    // Σ quota = N EXACTLY (spec-locked), which proportional rounding
    // can't promise. Pure int64 arithmetic throughout — DIV/MOD, no
    // floats to tie-break. Scale shape: one map-side-combinable
    // aggregation to the strata table, then every step runs on ≤
    // langs×sources rows: the two 1-row crosses are bounded builds and
    // the remainder rank is a global window over the value-domain-
    // bounded strata table (PlanAudit-whitelisted with that bound).
    "q197_quota_apportion" -> QDef(
      (s, d) => {
        val strata = documents(s, d).groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"))
        val tot = strata.agg(sum("n_docs").as("tot"))
        val base = strata.crossJoin(broadcast(tot))
          .withColumn("quota_base", expr("(10000 * n_docs) DIV tot"))
          .withColumn("remainder", expr("(10000 * n_docs) % tot"))
        val left = base.agg((lit(10000L) - sum("quota_base")).as("leftover"))
        base.crossJoin(broadcast(left))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("remainder").desc, col("lang"), col("source"))))
          .withColumn("quota",
            col("quota_base") + when(col("rnk") <= col("leftover"), 1L).otherwise(0L))
          .select("lang", "source", "n_docs", "quota_base", "remainder", "rnk",
            "quota")
          .orderBy("lang", "source")
      },
      """WITH strata AS (SELECT lang, source, COUNT(*) AS n_docs
        |                FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot FROM strata),
        |base AS (SELECT s.lang, s.source, s.n_docs,
        |                (10000 * s.n_docs) // tot.tot AS quota_base,
        |                (10000 * s.n_docs) % tot.tot AS remainder
        |         FROM strata s CROSS JOIN tot),
        |lft AS (SELECT 10000 - CAST(SUM(quota_base) AS BIGINT) AS leftover
        |        FROM base),
        |rk AS (SELECT b.*, lft.leftover,
        |              CAST(row_number() OVER (ORDER BY b.remainder DESC,
        |                                      b.lang, b.source) AS INTEGER) AS rnk
        |       FROM base b CROSS JOIN lft)
        |SELECT lang, source, n_docs, quota_base, remainder, rnk,
        |       quota_base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS quota
        |FROM rk ORDER BY lang, source""".stripMargin
    ),

    // --------------------------------------------------------------- q198
    // Repeated-n-gram memorization audit: the top-20 8-token grams by
    // document spread (df DESC, occurrences DESC, gram — a total order)
    // with occurrence/language counts and corpus share — the "what will
    // the model memorize" audit over the WHOLE corpus, complementing
    // q188's benchmark-targeted overlap. Scale shape: gram extraction is
    // the shared map-side explode (Round10i.docGrams), the rollup is a
    // map-side-combinable groupBy on the gram key, and top-20 is
    // TakeOrdered (no global window, no all-pairs); the 1-row total
    // cross is a bounded build. At 100 TB the gram key would be the
    // 8-byte hash (the q160 discipline) with strings resolved only for
    // the final 20.
    "q198_repeated_ngrams" -> QDef(
      (s, d) => {
        val grams = Round10i.docGrams(documents(s, d))
        val tot = documents(s, d).agg(count(lit(1)).as("n_docs_total"))
        grams.groupBy("gram")
          .agg(count(lit(1)).as("n_occ"),
            countDistinct("doc_id").as("df"),
            countDistinct("lang").as("n_langs"))
          .orderBy(col("df").desc, col("n_occ").desc, col("gram"))
          .limit(20)
          .crossJoin(broadcast(tot))
          .select(col("gram"), col("df"), col("n_occ"), col("n_langs"),
            (col("df").cast("double") / col("n_docs_total")).as("df_share"))
          .orderBy(col("df").desc, col("n_occ").desc, col("gram"))
      },
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |tt AS (SELECT * FROM toks WHERE len(tk) >= 8),
        |g AS (SELECT doc_id, lang, array_to_string(tk[i:i+7], ' ') AS gram
        |      FROM (SELECT doc_id, lang, tk,
        |                   unnest(generate_series(1, len(tk) - 7)) AS i
        |            FROM tt) sub),
        |stats AS (SELECT gram, COUNT(*) AS n_occ,
        |                 COUNT(DISTINCT doc_id) AS df,
        |                 COUNT(DISTINCT lang) AS n_langs
        |          FROM g GROUP BY 1
        |          ORDER BY df DESC, n_occ DESC, gram LIMIT 20),
        |tot AS (SELECT COUNT(*) AS n_docs_total FROM documents)
        |SELECT s.gram, s.df, s.n_occ, s.n_langs,
        |       CAST(s.df AS DOUBLE) / tot.n_docs_total AS df_share
        |FROM stats s CROSS JOIN tot
        |ORDER BY df DESC, n_occ DESC, gram""".stripMargin
    )
  )
}

package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 5: distribution-shape statistics — a Zipf-law fit over
  * each language's token frequencies (q174), the Fano factor of event
  * arrival counts (q175), and a single-changepoint scan over daily
  * volumes (q176).
  *
  * Determinism: q174 runs OLS on per-point ROUNDED-transcendental
  * decimals (q134/q140 recipe) so every normal-equation sum is exact;
  * q175 is pure integer sums with a final chain of raw IEEE quotients;
  * q176 orders by a score whose operands are bit-identical doubles in
  * both engines, with a calendar-day tie-break.
  */
object Round10e {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q174
    // Zipf fit per language: OLS slope of ln(freq) on ln(rank) over the
    // token frequency table — the vocabulary-shape check a corpus audit
    // runs (natural text ≈ −1; the SCALE.md §11 curves showed vocabulary
    // shape DRIVES dedup scalability, so this is the statistic to watch).
    // ln(rank)/ln(freq) are rounded per point to DECIMAL(18,4); all four
    // normal-equation sums are then exact and order-free; the slope is
    // one decimal→double cast chain + a raw division. Ranks are keyed
    // windows (per lang) with token tie-breaks.
    "q174_zipf_fit" -> QDef(
      (s, d) => {
        val tf = documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        val ranked = tf.withColumn("rnk",
          row_number().over(
            Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))).cast("long"))
        val pts = ranked.select(col("lang"),
          round(log(col("rnk")), 4).cast(Det.D).as("x"),
          round(log(col("cnt")), 4).cast(Det.D).as("y"))
        pts.groupBy("lang")
          .agg(
            count(lit(1)).as("n_types"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("slope",
            (col("n_types") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("n_types") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
          .select(col("lang"), col("n_types"),
            col("sx").cast("double").as("sx"), col("sy").cast("double").as("sy"),
            col("slope"))
          .orderBy("lang")
      },
      """WITH tf AS (SELECT lang, tok, COUNT(*) AS cnt FROM
        |  (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  GROUP BY 1, 2),
        |rk AS (SELECT lang, cnt,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
        |       FROM tf),
        |pts AS (SELECT lang,
        |          CAST(ROUND(ln(rnk), 4) AS DECIMAL(18,4)) AS x,
        |          CAST(ROUND(ln(cnt), 4) AS DECIMAL(18,4)) AS y
        |        FROM rk)
        |SELECT lang, COUNT(*) AS n_types,
        |       CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |       (COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
        |          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
        |       / (COUNT(*) * CAST(SUM(x * x) AS DOUBLE)
        |          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS slope
        |FROM pts GROUP BY 1 ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q175
    // Fano factor (variance-to-mean) of hourly arrival counts per event
    // type — the burstiness index (Poisson arrivals ⇒ 1; q169 flags the
    // individual bursts, this scores the dispersion). n, Σx, Σx² are
    // exact longs (Σx² ≪ 2^53 at any plausible hour count); variance,
    // mean, and fano are a chain of raw IEEE quotients over
    // identically-derived operands.
    "q175_fano_factor" -> QDef(
      (s, d) =>
        events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_hours"),
            sum("cnt").as("s1"),
            sum(col("cnt") * col("cnt")).as("s2"))
          .where(col("n_hours") >= 2)
          .withColumn("mean", col("s1") / col("n_hours"))
          .withColumn("variance",
            (col("n_hours") * col("s2") - col("s1") * col("s1")) /
              (col("n_hours") * (col("n_hours") - 1)))
          .withColumn("fano", col("variance") / col("mean"))
          .orderBy("event_type"),
      """WITH m AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |             COUNT(*) AS cnt
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, COUNT(*) AS n_hours,
        |       CAST(SUM(cnt) AS BIGINT) AS s1,
        |       CAST(SUM(cnt * cnt) AS BIGINT) AS s2,
        |       CAST(SUM(cnt) AS BIGINT) / COUNT(*) AS mean,
        |       (COUNT(*) * CAST(SUM(cnt * cnt) AS BIGINT)
        |          - CAST(SUM(cnt) AS BIGINT) * CAST(SUM(cnt) AS BIGINT))
        |         / (COUNT(*) * (COUNT(*) - 1)) AS variance,
        |       ((COUNT(*) * CAST(SUM(cnt * cnt) AS BIGINT)
        |          - CAST(SUM(cnt) AS BIGINT) * CAST(SUM(cnt) AS BIGINT))
        |         / (COUNT(*) * (COUNT(*) - 1)))
        |         / (CAST(SUM(cnt) AS BIGINT) / COUNT(*)) AS fano
        |FROM m GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY event_type""".stripMargin
    ),

    // --------------------------------------------------------------- q176
    // Single-changepoint scan per event type: the calendar day whose
    // before/after mean split of daily volumes differs most — the "when
    // did the traffic regime change" report (q93 z-scores days against a
    // global mean; this finds the level shift). All cumulative machinery
    // is keyed by event_type over the DAY-count table; the argmax orders
    // by a score computed from bit-identical doubles with a day
    // tie-break.
    "q176_changepoint" -> QDef(
      (s, d) => {
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val wAll = Window.partitionBy("event_type")
          .orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val daily = events(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
          .agg(count(lit(1)).as("cnt"))
        val scored = daily
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("st", sum("cnt").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("sn", sum("cnt").over(wAll))
          .where(col("t") < col("n"))
          .withColumn("mean_before", col("st") / col("t"))
          .withColumn("mean_after", (col("sn") - col("st")) / (col("n") - col("t")))
          .withColumn("score", abs(col("mean_before") - col("mean_after")))
        scored
          .withColumn("pick",
            row_number().over(
              Window.partitionBy("event_type").orderBy(col("score").desc, col("day"))))
          .where(col("pick") === 1)
          .select("event_type", "day", "t", "n", "mean_before", "mean_after", "score")
          .orderBy("event_type")
      },
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |                 COUNT(*) AS cnt
        |               FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day, cnt,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |          AS BIGINT) AS t,
        |        CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS st,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n,
        |        CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS sn
        |      FROM daily),
        |s AS (SELECT event_type, day, t, n,
        |        st / t AS mean_before,
        |        (sn - st) / (n - t) AS mean_after,
        |        abs(st / t - (sn - st) / (n - t)) AS score
        |      FROM c WHERE t < n),
        |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |                  ORDER BY score DESC, day) AS pick
        |      FROM s)
        |SELECT event_type, day, t, n, mean_before, mean_after, score
        |FROM p WHERE pick = 1 ORDER BY event_type""".stripMargin
    )
  )
}

package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 19: time-of-week seasonality — the load/traffic
  * profile (q215) and its drift gate (q216). q93's z-scores and q135's
  * KS test treat the event stream as one distribution; operational
  * series are SEASONAL, and both anomaly baselines and capacity plans
  * key on the (day-of-week × hour) grid.
  *
  * Portability: day-of-week is ARITHMETIC, never an engine calendar
  * function (Spark's dayofweek is 1=Sunday, DuckDB's dow is 0=Sunday —
  * deliberately avoided): dow = (epoch_days + 4) % 7 with 0 = Sunday
  * (1970-01-01 was a Thursday = 4). Hours come from the same wall-clock
  * both engines already agree on (the q31 date_trunc parity); averages
  * ride the Det decimal bridge; shares and ratios are raw IEEE
  * quotients of identical inputs.
  */
object Round10s {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q215
    // Seasonal load profile: per (dow, hr) cell the event count, exact
    // decimal-bridged mean value, and the cell's traffic ratio vs the
    // uniform expectation (n·168/total — how hot is this hour-of-week
    // slot). ≤ 168 cells at any volume. Scale shape: one map-side
    // projection, one map-side-combinable rollup, a 1-row grouping-free
    // total broadcast (NLJ-bounded) — no window at all.
    "q215_seasonal_profile" -> QDef(
      (s, d) => {
        val cells = events(s, d).select(
            (expr("(datediff(CAST(ts AS DATE), DATE '1970-01-01') + 4) % 7"))
              .cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"), col("value"))
          .groupBy("dow", "hr")
          .agg(count(lit(1)).as("n"), Det.davg(col("value")).as("avg_value"))
        cells.crossJoin(broadcast(cells.agg(sum("n").as("tot"))))
          .select(col("dow"), col("hr"), col("n"), col("avg_value"),
            ((col("n") * 168).cast("double") / col("tot")).as("load_ratio"))
          .orderBy("dow", "hr")
      },
      s"""WITH cells AS (
         |  SELECT ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS dow,
         |         CAST(hour(ts) AS BIGINT) AS hr,
         |         COUNT(*) AS n, ${Det.sqlDavg("value")} AS avg_value
         |  FROM events GROUP BY 1, 2)
         |SELECT CAST(dow AS BIGINT) AS dow, hr, n, avg_value,
         |       CAST(n * 168 AS DOUBLE)
         |         / (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS load_ratio
         |FROM cells ORDER BY dow, hr""".stripMargin
    ),

    // --------------------------------------------------------------- q216
    // Seasonal-structure drift: split the stream at the midpoint of its
    // epoch range (the q135 convention) and compare the TIME-OF-WEEK mix
    // of the two halves — per cell both halves' counts, their traffic
    // shares, and the absolute share drift, whose max row is the "did
    // the load pattern move" statistic (q135 answers it for VALUES; this
    // answers it for WHEN). Scale shape: a 1-row epoch min/max broadcast
    // (NLJ-bounded), one conditional-agg rollup to ≤ 168 cells, a 1-row
    // half-totals broadcast. Shares are raw quotients of exact counts.
    "q216_seasonal_drift" -> QDef(
      (s, d) => {
        val ep = events(s, d).select(
          expr("(datediff(CAST(ts AS DATE), DATE '1970-01-01') + 4) % 7")
            .cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"),
          unix_micros(col("ts")).as("es"))
        val mid = ep.agg(expr("(MIN(es) + MAX(es)) DIV 2").as("mid"))
        val cells = ep.crossJoin(broadcast(mid))
          .groupBy("dow", "hr")
          .agg(sum(when(col("es") < col("mid"), 1L).otherwise(0L)).as("n0"),
            sum(when(col("es") >= col("mid"), 1L).otherwise(0L)).as("n1"))
        val tots = cells.agg(sum("n0").as("t0"), sum("n1").as("t1"))
        cells.crossJoin(broadcast(tots))
          .select(col("dow"), col("hr"), col("n0"), col("n1"),
            (col("n0").cast("double") / col("t0")).as("share0"),
            (col("n1").cast("double") / col("t1")).as("share1"))
          .withColumn("drift", abs(col("share0") - col("share1")))
          .orderBy("dow", "hr")
      },
      """WITH ep AS (
        |  SELECT ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS dow,
        |         CAST(hour(ts) AS BIGINT) AS hr,
        |         epoch_us(ts) AS es
        |  FROM events),
        |mid AS (SELECT (MIN(es) + MAX(es)) // 2 AS mid FROM ep),
        |cells AS (
        |  SELECT dow, hr,
        |         CAST(SUM(CASE WHEN es < mid THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |         CAST(SUM(CASE WHEN es >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM ep CROSS JOIN mid GROUP BY 1, 2),
        |tots AS (SELECT CAST(SUM(n0) AS BIGINT) AS t0,
        |                CAST(SUM(n1) AS BIGINT) AS t1 FROM cells)
        |SELECT CAST(dow AS BIGINT) AS dow, hr, n0, n1,
        |       CAST(n0 AS DOUBLE) / t0 AS share0,
        |       CAST(n1 AS DOUBLE) / t1 AS share1,
        |       abs(CAST(n0 AS DOUBLE) / t0 - CAST(n1 AS DOUBLE) / t1) AS drift
        |FROM cells CROSS JOIN tots ORDER BY dow, hr""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 third wave: optimizer-statistics and modeling operators —
  * equi-depth histograms (the quantile-binning / CBO-statistics build),
  * deterministic weighted priority sampling, closed-form two-regressor
  * OLS per group, and sequential pattern mining (event trigrams).
  *
  * Reference provenance: N/A (empty checkout, SURVEY.md §0).
  *
  * Determinism contract (CLAUDE.md): money doubles enter exact DECIMAL
  * cents before any arithmetic; cumulative counts are exact int64 via the
  * two-pass Scan; OLS normal-equation terms are EXACT DECIMAL(38,0)
  * differences cast to double only while their unscaled values fit 2^53;
  * every division is a raw IEEE quotient; all output orders are total.
  */
object Round9c {
  import Tables._

  private val P = 104729L // house prime (q46/q56 hash family)

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q138
    // Equi-depth (equi-height) histogram over event values, B = 16 — the
    // statistics object a cost-based optimizer builds per column, and the
    // quantile-binning step of feature engineering. Bucket of a value =
    // floor(cum_before · B / n): exact integer arithmetic on the exclusive
    // cumulative count, so bucket populations differ only where a single
    // heavy value straddles a boundary (the textbook equi-depth property).
    // Scale shape: per-cent pre-aggregate (≤ 49 102 rows at ANY volume),
    // cumulative counts via Scan.runningSumByRange (bucketed, parallel;
    // the only global frame is the P-row carry — whitelisted), then a
    // 16-row rollup. No global sort anywhere.
    "q138_equidepth_hist" -> QDef(
      (s, d) => {
        val ev = events(s, d).select(
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("v"))
        val byv = ev.groupBy("v").agg(count(lit(1)).as("cnt"))
        val tots = byv.agg(sum("cnt").as("n"))
        Scan.runningSumByRange(byv, col("v"), col("v"), col("cnt"), "cx",
            lo = 0L, hi = 49100L)
          .crossJoin(broadcast(tots))
          .withColumn("bucket", expr("(cx * 16) DIV n"))
          .groupBy("bucket")
          .agg(min("v").as("lo_cents"), max("v").as("hi_cents"),
            sum("cnt").as("n_rows"), count(lit(1)).as("n_distinct"))
          .orderBy("bucket")
      },
      """WITH e AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM events),
        |byv AS (SELECT v, COUNT(*) AS cnt FROM e GROUP BY 1),
        |tots AS (SELECT SUM(cnt) AS n FROM byv),
        |cum AS (SELECT v, cnt,
        |               COALESCE(SUM(cnt) OVER (ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cx
        |        FROM byv)
        |SELECT CAST((cx * 16) // n AS BIGINT) AS bucket,
        |       min(v) AS lo_cents, max(v) AS hi_cents,
        |       CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct
        |FROM cum, tots GROUP BY 1 ORDER BY bucket""".stripMargin
    ),

    // --------------------------------------------------------------- q139
    // Deterministic weighted priority sample: each order draws a uniform
    // integer u ∈ [1, P] from the house hash of its key and gets priority
    // u / weight (weight = total price in exact cents) — the smallest
    // priorities form a weight-biased sample (an order with 10× the spend
    // is ~10× as likely to rank early), the classic priority-sampling
    // scheme for weighted subset selection. u and w are exact int64, so
    // the priority is ONE correctly-rounded IEEE division — identical in
    // both engines at any magnitude — and (priority, o_orderkey) is a
    // total order, so the top-20 boundary is deterministic. Scale shape:
    // scan + TakeOrdered (per-partition top-k then a 20-row merge): no
    // shuffle of the data, the canonical distributed top-k.
    "q139_weighted_sample" -> QDef(
      (s, d) =>
        orders(s, d).select(col("o_orderkey"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("w_cents"))
          .withColumn("u", (col("o_orderkey") * 7919 + 13) % P + 1)
          .withColumn("priority", col("u").cast("double") / col("w_cents").cast("double"))
          .select("o_orderkey", "w_cents", "priority")
          .orderBy(col("priority"), col("o_orderkey"))
          .limit(20),
      s"""SELECT o_orderkey,
         |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w_cents,
         |       CAST((o_orderkey * 7919 + 13) % $P + 1 AS DOUBLE) /
         |         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DOUBLE)
         |         AS priority
         |FROM orders
         |ORDER BY priority, o_orderkey LIMIT 20""".stripMargin
    ),

    // --------------------------------------------------------------- q140
    // Two-regressor OLS per group, closed form: value-cents on (hour of
    // day, ISO weekday) per event_type — "does spend follow time-of-day
    // or day-of-week?" — the multiple-regression step q111's single-slope
    // screen cannot express. Normal equations via centered 2×2 Cramer:
    // every moment sum is EXACT DECIMAL(19,0); the matrix entries
    // m11/m12/m22/c1/c2 are exact decimal differences (largest ≈ n²·cov,
    // ~1e13 here) cast to double while unscaled < 2^53 (the q116
    // portability bound — at extreme row counts keep them DECIMAL);
    // det/b1/b2/b0 are then identically-shaped double expressions on both
    // engines. Degenerate (collinear) groups are excluded by EXACT
    // decimal determinant compare. Scale: one scan, one map-side-
    // combinable aggregate per type, a per-group closed form — no window,
    // no iteration (contrast gradient descent: zero passes beyond the
    // sums).
    "q140_ols2" -> QDef(
      (s, d) => {
        val dec = "decimal(19,0)"
        val ev = events(s, d).select(col("event_type"),
          hour(col("ts")).cast(dec).as("x1"),
          (weekday(col("ts")) + 1).cast(dec).as("x2"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").cast(dec).as("y"))
        val sums = ev.groupBy("event_type").agg(
          count(lit(1)).cast(dec).as("n"),
          sum("x1").as("sx1"), sum("x2").as("sx2"), sum("y").as("sy"),
          sum(col("x1") * col("x1")).as("sx1x1"),
          sum(col("x2") * col("x2")).as("sx2x2"),
          sum(col("x1") * col("x2")).as("sx1x2"),
          sum(col("x1") * col("y")).as("sx1y"),
          sum(col("x2") * col("y")).as("sx2y"))
        // Degeneracy guard on the DOUBLE det, not an exact decimal product:
        // m11·m22 and m12² are products of two ~1e13 decimals, and a
        // DECIMAL(38,0)×DECIMAL(38,0) product overflows 38 digits long
        // before the matrix ENTRIES leave their documented 2^53 double
        // bound (round-9 ADVICE — Spark non-ANSI nulls the overflow while
        // DuckDB promotes, a latent divergence at large n). The entries
        // themselves are exact-in-double by the q116 bound, so det as the
        // IEEE double expression m11·m22 − m12² is bit-identical in both
        // engines, and `det != 0` is the portable collinearity filter.
        sums
          .withColumn("m11", (col("n") * col("sx1x1") - col("sx1") * col("sx1")).cast("double"))
          .withColumn("m22", (col("n") * col("sx2x2") - col("sx2") * col("sx2")).cast("double"))
          .withColumn("m12", (col("n") * col("sx1x2") - col("sx1") * col("sx2")).cast("double"))
          .withColumn("c1", (col("n") * col("sx1y") - col("sx1") * col("sy")).cast("double"))
          .withColumn("c2", (col("n") * col("sx2y") - col("sx2") * col("sy")).cast("double"))
          .withColumn("det", col("m11") * col("m22") - col("m12") * col("m12"))
          .where(col("det") =!= 0.0)
          .withColumn("b1", (col("m22") * col("c1") - col("m12") * col("c2")) / col("det"))
          .withColumn("b2", (col("m11") * col("c2") - col("m12") * col("c1")) / col("det"))
          .withColumn("b0",
            (col("sy").cast("double") - col("b1") * col("sx1").cast("double")
              - col("b2") * col("sx2").cast("double")) / col("n").cast("double"))
          .select(col("event_type"), col("n").cast("long").as("n_obs"),
            col("b0"), col("b1"), col("b2"))
          .orderBy("event_type")
      },
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(hour(ts) AS DECIMAL(19,0)) AS x1,
        |         CAST(isodow(ts) AS DECIMAL(19,0)) AS x2,
        |         CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(19,0)) AS y
        |  FROM events),
        |sums AS (
        |  SELECT event_type, CAST(COUNT(*) AS DECIMAL(19,0)) AS n,
        |         SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
        |         SUM(x1 * x1) AS sx1x1, SUM(x2 * x2) AS sx2x2,
        |         SUM(x1 * x2) AS sx1x2, SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y
        |  FROM ev GROUP BY 1),
        |m AS (
        |  SELECT event_type, n, sx1, sx2, sy,
        |         CAST(n * sx1x1 - sx1 * sx1 AS DOUBLE) AS m11,
        |         CAST(n * sx2x2 - sx2 * sx2 AS DOUBLE) AS m22,
        |         CAST(n * sx1x2 - sx1 * sx2 AS DOUBLE) AS m12,
        |         CAST(n * sx1y - sx1 * sy AS DOUBLE) AS c1,
        |         CAST(n * sx2y - sx2 * sy AS DOUBLE) AS c2
        |  FROM sums),
        |b AS (
        |  SELECT event_type, n, sx1, sx2, sy,
        |         m11 * m22 - m12 * m12 AS det,
        |         (m22 * c1 - m12 * c2) / (m11 * m22 - m12 * m12) AS b1,
        |         (m11 * c2 - m12 * c1) / (m11 * m22 - m12 * m12) AS b2
        |  FROM m
        |  WHERE m11 * m22 - m12 * m12 <> 0)
        |SELECT event_type, CAST(n AS BIGINT) AS n_obs,
        |       (CAST(sy AS DOUBLE) - b1 * CAST(sx1 AS DOUBLE)
        |          - b2 * CAST(sx2 AS DOUBLE)) / CAST(n AS DOUBLE) AS b0,
        |       b1, b2
        |FROM b ORDER BY event_type""".stripMargin
    ),

    // --------------------------------------------------------------- q141
    // Sequential pattern mining: the 20 most frequent event-type TRIGRAMS
    // across per-user event sequences — the order-sensitive companion of
    // q96's pair transitions and q110's attribution paths (what three-step
    // behaviors dominate?). Sequences are per-user windows ordered by the
    // total (ts, event_id) key; the trigram extract is two leads in ONE
    // keyed window (single shuffle on user_id, partitions bounded by
    // per-user activity), then a map-side-combinable count and a
    // TakeOrdered top-20 under the total (n DESC, t1, t2, t3) order.
    "q141_event_trigrams" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("t1"))
          .withColumn("t2", lead("t1", 1).over(w))
          .withColumn("t3", lead("t1", 2).over(w))
          .where(col("t3").isNotNull)
          .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
          .limit(20)
      },
      """WITH seq AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1, t2, t3, COUNT(*) AS n
        |FROM seq WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin
    )
  )
}

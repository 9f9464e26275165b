package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 4: statistics depth — an exactly-representable EWMA
  * (q170), Spearman rank correlation (q171), mutual information (q172),
  * and Pareto coverage (q173).
  *
  * Determinism highlights: q170's smoothing weights are powers of two, so
  * every product is IEEE-exact integer arithmetic (no decimal bridge
  * needed at all); q171 is pure integer sums with one final raw quotient;
  * q172 follows q155's rounded-transcendental-term decimal summation;
  * q173 is integer cumulative sums over a source-count table.
  */
object Round10d {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q170
    // Exponentially-weighted moving average of hourly event counts, per
    // event_type — the trend line a monitoring dashboard draws next to
    // q169's burst flags. α = 1/2 with a 10-step memory, statically
    // unrolled as 11 lag() taps: weight 2^(10-k) for the count k hours
    // back. Every weight is a power of two and every count an integer, so
    // num/den are EXACT longs and the published ewma is one raw IEEE
    // quotient — no decimal bridge, no rounding, nothing to tie.
    // Scale: hour pre-agg map-side combinable; the lag window runs per
    // event_type over hour-count rows (time-range-bounded).
    "q170_ewma_counts" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("hour")
        val hourly = events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val num = (0 to 10).map(k =>
          coalesce(lag(col("cnt"), k).over(w), lit(0L)) * lit(1L << (10 - k)))
          .reduce(_ + _)
        val den = (0 to 10).map(k =>
          when(lag(col("cnt"), k).over(w).isNotNull, lit(1L << (10 - k))).otherwise(lit(0L)))
          .reduce(_ + _)
        hourly
          .withColumn("ewma_num", num)
          .withColumn("ewma_den", den)
          .withColumn("ewma", col("ewma_num") / col("ewma_den"))
          .select("event_type", "hour", "cnt", "ewma_num", "ewma_den", "ewma")
          .orderBy("event_type", "hour")
      },
      {
        val num = (0 to 10).map(k =>
          s"COALESCE(lag(cnt, $k) OVER w, 0) * ${1L << (10 - k)}").mkString(" + ")
        val den = (0 to 10).map(k =>
          s"CASE WHEN lag(cnt, $k) OVER w IS NOT NULL THEN ${1L << (10 - k)} ELSE 0 END")
          .mkString(" + ")
        s"""WITH m AS (SELECT event_type, date_trunc('hour', ts) AS hour,
          |             COUNT(*) AS cnt
          |           FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, hour, cnt,
          |        CAST($num AS BIGINT) AS ewma_num,
          |        CAST($den AS BIGINT) AS ewma_den
          |      FROM m
          |      WINDOW w AS (PARTITION BY event_type ORDER BY hour))
          |SELECT event_type, hour, cnt, ewma_num, ewma_den,
          |       ewma_num / ewma_den AS ewma
          |FROM w ORDER BY event_type, hour""".stripMargin
      }
    ),

    // --------------------------------------------------------------- q171
    // Spearman rank correlation per nation between a customer's account
    // balance and their order count — "does balance predict activity".
    // Ranks are row_number with c_custkey tie-breaks (identical both
    // engines), d² sums are exact integers (n < 2^17 ⇒ n³ ≪ 2^53), and
    // ρ = 1 − 6Σd²/(n(n²−1)) is one raw quotient. Scale: one keyed
    // join-agg (customer×orders) + two keyed windows per nation.
    "q171_spearman" -> QDef(
      (s, d) => {
        val oc = orders(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        val cust = customer(s, d)
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        val rb = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val ro = Window.partitionBy("c_nationkey")
          .orderBy(col("n_orders").desc, col("c_custkey"))
        cust
          .withColumn("rank_bal", row_number().over(rb).cast("long"))
          .withColumn("rank_ord", row_number().over(ro).cast("long"))
          .withColumn("d2",
            (col("rank_bal") - col("rank_ord")) * (col("rank_bal") - col("rank_ord")))
          .groupBy(col("c_nationkey").cast("int").as("nationkey"))
          .agg(count(lit(1)).as("n"), sum("d2").as("sum_d2"))
          .where(col("n") >= 2)
          .withColumn("rho",
            lit(1.0) - (lit(6L) * col("sum_d2")) / (col("n") * (col("n") * col("n") - 1)))
          .orderBy("nationkey")
      },
      """WITH oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
        |cust AS (SELECT c_custkey, c_nationkey, c_acctbal,
        |           COALESCE(n_orders, 0) AS n_orders
        |         FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
        |rk AS (SELECT c_nationkey,
        |         CAST(row_number() OVER (PARTITION BY c_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rank_bal,
        |         CAST(row_number() OVER (PARTITION BY c_nationkey
        |           ORDER BY n_orders DESC, c_custkey) AS BIGINT) AS rank_ord
        |       FROM cust)
        |SELECT CAST(c_nationkey AS INT) AS nationkey, COUNT(*) AS n,
        |       CAST(SUM((rank_bal - rank_ord) * (rank_bal - rank_ord)) AS BIGINT)
        |         AS sum_d2,
        |       1.0 - (6 * CAST(SUM((rank_bal - rank_ord) * (rank_bal - rank_ord))
        |                       AS BIGINT))
        |             / (COUNT(*) * (COUNT(*) * COUNT(*) - 1)) AS rho
        |FROM rk GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY nationkey""".stripMargin
    ),

    // --------------------------------------------------------------- q172
    // Mutual information between event_type and hour-of-day — "how much
    // does WHEN predict WHAT" (the feature-relevance score a feature
    // selector computes; χ² cousin: q133). Cell terms
    // (n_xy/N)·ln(n_xy·N/(n_x·n_y)) are rounded transcendentals summed as
    // exact decimals (the q155 recipe), rolled up per event_type so the
    // output shows each type's MI contribution. Scale: one
    // map-side-combinable (type, hour) count; everything downstream is
    // cell-table-sized (types × 24).
    "q172_mutual_info" -> QDef(
      (s, d) => {
        val cells = events(s, d)
          .groupBy(col("event_type"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("n_xy"))
        val nx = cells.groupBy("event_type").agg(sum("n_xy").as("n_x"))
        val ny = cells.groupBy("hr").agg(sum("n_xy").as("n_y"))
        val tot = cells.agg(sum("n_xy").as("n_tot"))
        cells
          .join(nx, "event_type")
          .join(broadcast(ny), "hr")
          .crossJoin(broadcast(tot))
          .withColumn("term",
            round((col("n_xy") / col("n_tot")) *
              log((col("n_xy") * col("n_tot")) / (col("n_x") * col("n_y"))), 4)
              .cast(Det.D))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_cells"),
            max("n_x").as("n_type"),
            sum("term").cast("double").as("mi_contrib"))
          .orderBy("event_type")
      },
      """WITH cells AS (SELECT event_type, EXTRACT(hour FROM ts) AS hr,
        |                 COUNT(*) AS n_xy
        |               FROM events GROUP BY 1, 2),
        |nx AS (SELECT event_type, CAST(SUM(n_xy) AS BIGINT) AS n_x
        |       FROM cells GROUP BY 1),
        |ny AS (SELECT hr, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_tot FROM cells)
        |SELECT cells.event_type AS event_type, COUNT(*) AS n_cells, MAX(n_x) AS n_type,
        |       CAST(SUM(CAST(ROUND((n_xy / n_tot) *
        |         ln((n_xy * n_tot) / (n_x * n_y)), 4) AS DECIMAL(18,4)))
        |         AS DOUBLE) AS mi_contrib
        |FROM cells JOIN nx ON cells.event_type = nx.event_type
        |           JOIN ny ON cells.hr = ny.hr
        |           CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // --------------------------------------------------------------- q173
    // Pareto coverage of sources: rank sources by document count and walk
    // the cumulative share — every source flagged with whether it is
    // inside the minimal prefix covering ≥80% of the corpus (q154's HHI
    // says HOW concentrated; this says WHO makes up the head). The
    // cumulative window runs over the SOURCE-COUNT table (one row per
    // source — value-domain-bounded, the q151 Scan-carry class, PlanAudit-
    // whitelisted with that justification). Integer cumulative sums; the
    // share is a raw quotient; the 80% test cross-multiplies integers.
    "q173_pareto_coverage" -> QDef(
      (s, d) => {
        val sc = documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
        val w = Window.orderBy(col("n_docs").desc, col("source"))
        sc.crossJoin(broadcast(sc.agg(sum("n_docs").as("n_total"))))
          .withColumn("rnk", row_number().over(w))
          .withColumn("cum_docs", sum("n_docs").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_share", col("cum_docs") / col("n_total"))
          .withColumn("in_head80",
            (col("cum_docs") - col("n_docs")) * lit(5L) < col("n_total") * lit(4L))
          .select("rnk", "source", "n_docs", "cum_docs", "cum_share", "in_head80")
          .orderBy("rnk")
      },
      """WITH sc AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM sc),
        |r AS (SELECT source, n_docs, n_total,
        |        CAST(row_number() OVER (ORDER BY n_docs DESC, source) AS INT) AS rnk,
        |        CAST(SUM(n_docs) OVER (ORDER BY n_docs DESC, source
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_docs
        |      FROM sc CROSS JOIN t)
        |SELECT rnk, source, n_docs, cum_docs,
        |       cum_docs / n_total AS cum_share,
        |       (cum_docs - n_docs) * 5 < n_total * 4 AS in_head80
        |FROM r ORDER BY rnk""".stripMargin
    )
  )
}

package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.functions._

/** Coverage completions added after the first full parity pass: the
  * remaining join shape (full outer) and the approximate / exact
  * order-statistics aggregates. q54's approximate sketches (HLL,
  * KLL-style quantiles) are engine-specific by nature, so it declares NO
  * oracle — the driver records the weaker rows-only check, which is the
  * documented contract for non-portable ops. They're in the inventory
  * because they ARE the 100 TB escape hatches for q39-style exact
  * distincts and q55-style exact percentiles.
  */
object Relational2 {
  import Det._
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // Full outer join: users that only have events, customers that only
    // have orders, and the matched middle — all in one result.
    "q53_join_full_outer" -> QDef(
      (s, d) => {
        val eventUsers = events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        val orderCusts = orders(s, d)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        eventUsers
          .join(orderCusts, col("user_id") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("user_id"), col("o_custkey")).as("cust"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders")
          )
          .orderBy("cust")
      },
      """WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
        |     oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT coalesce(user_id, o_custkey) AS cust,
        |       coalesce(n_events, 0) AS n_events,
        |       coalesce(n_orders, 0) AS n_orders
        |FROM ev FULL OUTER JOIN oc ON user_id = o_custkey
        |ORDER BY cust""".stripMargin
    ),

    // Approximate aggregates — the scale escape hatches. HLL/quantile
    // sketches are implementation-specific, so: NO oracle (rows-only
    // gate). The spec instead sanity-bounds them against exact values.
    "q54_approx_stats" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median_price"),
            count(lit(1)).as("n_rows")
          )
          .orderBy("l_returnflag"),
      oracle = null // intentionally omitted from oracleSql (see SparkEntry)
    ),

    // Pivot: event counts per day × event_type. The pivot column set is
    // pinned explicitly (never inferred — inference is an extra pass and
    // nondeterministic column order); the oracle spells the same op as
    // portable conditional aggregation.
    "q57_pivot" -> QDef(
      (s, d) =>
        events(s, d)
          .select(col("ts").cast("date").as("day"), col("event_type"))
          .groupBy("day")
          .pivot("event_type", Seq("click", "purchase", "error", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("day"),
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // Regex functions. Patterns are deliberately conservative (literal
    // fragments + character classes) so Java regex (Spark) and RE2
    // (DuckDB) agree; fancier constructs (lookarounds, backrefs) are
    // where the engines diverge and are avoided.
    "q58_regex" -> QDef(
      (s, d) =>
        customer(s, d)
          .select(
            col("c_custkey"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
            regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
            col("c_name").rlike("Customer#0*[0-9]{1,3}$").as("low_key"),
            regexp_extract(col("c_mktsegment"), "^([A-Z]{4})", 1).as("seg4")
          )
          .orderBy("c_custkey")
          .limit(200),
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(c_name, 'Customer#0*[0-9]{1,3}$') AS low_key,
        |  regexp_extract(c_mktsegment, '^([A-Z]{4})', 1) AS seg4
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin
    ),

    // Unpivot (melt): wide numeric lineitem columns → long (attr, val)
    // form. Oracle spells it as the portable UNION ALL.
    "q59_unpivot" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "attr",
            "val"
          )
          .orderBy("l_orderkey", "l_linenumber", "attr", "val")
          .limit(500),
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS attr, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber, attr, val LIMIT 500""".stripMargin
    ),

    // Scalar + correlated subqueries through the SQL entry point: orders
    // above the global average with their per-customer rank context.
    "q60_scalar_subquery" -> QDef(
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_sq")
        s.sql(
          """SELECT o_orderkey, o_custkey, o_totalprice
            |FROM graft_orders_sq o
            |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            |                                   / COUNT(*)
            |                          FROM graft_orders_sq)
            |  AND EXISTS (SELECT 1 FROM graft_orders_sq i
            |              WHERE i.o_custkey = o.o_custkey AND i.o_orderkey <> o.o_orderkey)
            |ORDER BY o_orderkey""".stripMargin
        )
      },
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |                                   / COUNT(*)
        |                          FROM orders)
        |  AND EXISTS (SELECT 1 FROM orders i
        |              WHERE i.o_custkey = o.o_custkey AND i.o_orderkey <> o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin
    ),

    // Exact order statistics: median + p90 via percentile(), which sorts
    // and linearly interpolates — same definition as DuckDB quantile_cont.
    "q55_percentiles" -> QDef(
      (s, d) =>
        orders(s, d)
          .groupBy("o_orderstatus")
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("median_price"),
            expr("percentile(o_totalprice, 0.9)").as("p90_price"),
            count(lit(1)).as("n_orders")
          )
          .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |       quantile_cont(o_totalprice, 0.5) AS median_price,
        |       quantile_cont(o_totalprice, 0.9) AS p90_price,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    )
  )
}

package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, expressions, aggregations, joins, set
  * ops, window functions, top-k, scalar functions (SURVEY.md §2.2 q01–q30).
  *
  * Everything here is declarative DataFrame API so Catalyst gets full
  * freedom: predicate pushdown + column pruning reach the parquet scan,
  * joins pick broadcast-hash vs sort-merge from sizes (with explicit
  * `broadcast()` where we know the dim is small), and aggregations run
  * partial+final. Scale notes are given per query where they matter.
  */
object Relational {
  import Det._
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // ---------------------------------------------------------------- scans
    "q01_scan_project" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          // lineitem has NO unique key (duplicate (l_orderkey, l_linenumber)
          // pairs exist — FIXTURES.md's uniqueness note is wrong); order by
          // every output column so the prefix cut is deterministic.
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .limit(100),
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |LIMIT 100""".stripMargin
    ),

    // TPC-H Q6-shaped conjunctive filter; predicates push to the parquet
    // scan (PushedFilters — asserted in PlanShapeTest).
    "q02_filter" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .where(
            col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
              col("l_discount").between(0.02, 0.09) &&
              col("l_quantity") < 24
          )
          .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_discount")
          .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_discount")
          .limit(200),
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.09
        |  AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, l_quantity, l_discount
        |LIMIT 200""".stripMargin
    ),

    // Per-row arithmetic + CASE WHEN. Raw doubles: both engines compute the
    // identical IEEE product, so no rounding is needed (or wanted).
    "q03_expr_project" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .withColumn(
            "disc_band",
            when(col("l_discount") < 0.03, "LOW")
              .when(col("l_discount") < 0.07, "MID")
              .otherwise("HIGH")
          )
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "revenue", "disc_band")
          .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
          .limit(200),
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |       l_extendedprice * (1.0 - l_discount) AS revenue,
        |       CASE WHEN l_discount < 0.03 THEN 'LOW'
        |            WHEN l_discount < 0.07 THEN 'MID' ELSE 'HIGH' END AS disc_band
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount
        |LIMIT 200""".stripMargin
    ),

    // ----------------------------------------------------------- aggregation
    // TPC-H Q1 analog: partial+final HashAggregate; decimal bridge for the
    // double sums (order-independent ⇒ shuffle-safe at any scale).
    "q04_agg_pricing" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("n_items")
          )
          .orderBy("l_returnflag", "l_linestatus"),
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  COUNT(*) AS n_items
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ),

    "q05_agg_distinct" -> QDef(
      (s, d) =>
        orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            countDistinct(col("o_custkey")).as("n_custs"),
            count(lit(1)).as("n_orders")
          )
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ),

    "q06_rollup" -> QDef(
      (s, d) => {
        region(s, d)
          .join(nation(s, d), col("r_regionkey") === col("n_regionkey"))
          .join(customer(s, d), col("c_nationkey") === col("n_nationkey"))
          .select("r_name", "n_name", "c_custkey")
          .createOrReplaceTempView("graft_geo_rollup")
        s.sql(
          """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
            |       COUNT(c_custkey) AS n_custs,
            |       CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
            |FROM graft_geo_rollup
            |GROUP BY ROLLUP(r_name, n_name)
            |ORDER BY 1, 2, 4, 5""".stripMargin
        )
      },
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |       COUNT(c_custkey) AS n_custs,
        |       CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |            JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 1, 2, 4, 5""".stripMargin
    ),

    "q07_cube" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_items"),
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls")
          )
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
            col("sum_qty"), col("n_items"), col("g_rf"), col("g_ls")
          )
          .orderBy("l_returnflag", "l_linestatus", "g_rf", "g_ls"),
      s"""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
         |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
         |       ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_items,
         |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY 1, 2, 5, 6""".stripMargin
    ),

    // SQL entry point (SURVEY §3.2 #2): GROUPING SETS via spark.sql.
    "q08_grouping_sets" -> QDef(
      (s, d) => {
        events(s, d)
          .select(col("event_type"), col("ts").cast("date").as("event_date"), col("value"))
          .createOrReplaceTempView("graft_ev_gs")
        s.sql(
          """SELECT coalesce(event_type, 'ALL') AS event_type,
            |       coalesce(CAST(event_date AS STRING), 'ALL') AS event_date,
            |       COUNT(*) AS n_events,
            |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
            |FROM graft_ev_gs
            |GROUP BY GROUPING SETS ((event_type), (event_date), ())
            |ORDER BY 1, 2""".stripMargin
        )
      },
      s"""SELECT coalesce(event_type, 'ALL') AS event_type,
         |       coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS event_date,
         |       COUNT(*) AS n_events,
         |       ${sqlDsum("value")} AS sum_value
         |FROM events
         |GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
         |ORDER BY 1, 2""".stripMargin
    ),

    // ----------------------------------------------------------------- joins
    "q09_join_inner" -> QDef(
      (s, d) =>
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("c_mktsegment"),
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |       ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    ),

    // TPC-H Q5 analog: 6-table join. nation/region/supplier are broadcast
    // by Catalyst automatically (under the 10MB threshold at any SF where
    // dims stay dim-sized); the fact joins shuffle on their keys.
    "q10_join_multi" -> QDef(
      (s, d) => {
        val rev = customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(
            supplier(s, d),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey")
          )
          .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        rev
          .groupBy("n_name")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      s"""SELECT n_name,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ),

    "q11_join_left" -> QDef(
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey", "c_name")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
          .limit(100),
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey LIMIT 100""".stripMargin
    ),

    "q12_join_semi" -> QDef(
      (s, d) =>
        customer(s, d)
          .join(
            events(s, d).where(col("event_type") === "purchase"),
            col("c_custkey") === col("user_id"),
            "left_semi"
          )
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM events
        |              WHERE event_type = 'purchase' AND user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ),

    // Anti join on a rare condition (status 'P' orders) — every customer
    // has SOME order in this data, so "no orders at all" would be a
    // vacuous (0-row) query; "no pending orders" is non-vacuous at every
    // SF while exercising the same LeftAnti plan.
    "q13_join_anti" -> QDef(
      (s, d) =>
        customer(s, d)
          .join(
            orders(s, d).where(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"),
            "left_anti"
          )
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin
    ),

    // Flagship analog of the Flink broadcast connect (SURVEY §2.1 R7/R8):
    // explicit broadcast() hints → BroadcastHashJoinExec, no shuffle of the
    // event stream. At 100 TB the dims stay broadcast-able; the big side
    // streams through map-side joins.
    "q14_join_broadcast" -> QDef(
      (s, d) =>
        events(s, d)
          .join(broadcast(customer(s, d)), col("user_id") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .orderBy("n_name"),
      s"""SELECT n_name, COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    ),

    // Equi + band predicate: Catalyst executes the equi part as the join key
    // and the band as a post-join filter — never a cartesian.
    "q15_join_theta_range" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .join(
            part(s, d),
            col("l_partkey") === col("p_partkey") &&
              col("l_quantity").between(col("p_size") - 5, col("p_size") + 5)
          )
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("p_brand"),
      s"""SELECT p_brand, COUNT(*) AS n_items, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |  AND l_quantity BETWEEN p_size - 5 AND p_size + 5
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin
    ),

    // As-of join: latest prior click per purchase. Spark-first: a single
    // per-user window pass (one shuffle, no self-join blowup — the
    // correlated-join form the oracle uses would be quadratic per user at
    // scale). RANGE frame on unix_micros excludes same-instant rows ⇒
    // strict `click.ts < purchase.ts`, matching the oracle exactly
    // (verified: zero duplicate (user_id, ts) pairs in the data).
    "q16_join_asof" -> QDef(
      (s, d) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(Window.unboundedPreceding, -1)
        events(s, d)
          .withColumn("last_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
          .where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "last_click_ts")
          .orderBy("event_id")
      },
      """SELECT p.event_id, p.user_id, p.ts, MAX(c.ts) AS last_click_ts
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin
    ),

    // -------------------------------------------------------------- set ops
    "q17_union" -> QDef(
      (s, d) => {
        val ev = events(s, d)
        val a = ev.where(col("event_type").isin("click", "purchase")).select("event_id", "user_id")
        val b = ev.where(col("value") >= 150.0).select("event_id", "user_id")
        val allRows = a.unionAll(b).select(lit("all").as("src"), col("event_id"), col("user_id"))
        val distRows = a.union(b).distinct().select(lit("dist").as("src"), col("event_id"), col("user_id"))
        allRows.unionAll(distRows).orderBy("src", "event_id", "user_id")
      },
      """WITH a AS (SELECT event_id, user_id FROM events WHERE event_type IN ('click','purchase')),
        |     b AS (SELECT event_id, user_id FROM events WHERE value >= 150.0)
        |SELECT 'all' AS src, event_id, user_id FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'dist' AS src, event_id, user_id FROM (SELECT * FROM a UNION SELECT * FROM b)
        |ORDER BY src, event_id, user_id""".stripMargin
    ),

    "q18_intersect" -> QDef(
      (s, d) => {
        val ev = events(s, d)
        ev.where(col("event_type") === "click").select("user_id")
          .intersect(ev.where(col("event_type") === "purchase").select("user_id"))
          .orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin
    ),

    // EXCEPT at minute granularity: every user does every event type in
    // this data (user-level set differences are all empty), but minutes
    // with an error and no signup exist at every SF.
    "q19_except" -> QDef(
      (s, d) => {
        val ev = events(s, d)
        ev.where(col("event_type") === "error")
          .select(date_trunc("minute", col("ts")).as("minute"))
          .except(
            ev.where(col("event_type") === "signup")
              .select(date_trunc("minute", col("ts")).as("minute")))
          .orderBy("minute")
      },
      """SELECT date_trunc('minute', ts) AS minute FROM events WHERE event_type = 'error'
        |EXCEPT
        |SELECT date_trunc('minute', ts) AS minute FROM events WHERE event_type = 'signup'
        |ORDER BY minute""".stripMargin
    ),

    // ----------------------------------------------------- window functions
    // row_number over a unique ordering; rank/dense_rank over a genuinely
    // tied ordering (priority) — tie-insensitive values, deterministic.
    "q20_window_rank" -> QDef(
      (s, d) => {
        val wTop = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wPri = Window.partitionBy("o_custkey").orderBy(col("o_orderpriority"))
        orders(s, d)
          .withColumn("rn", row_number().over(wTop))
          .withColumn("rnk", rank().over(wPri))
          .withColumn("drnk", dense_rank().over(wPri))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderpriority", "rn", "rnk", "drnk")
          .orderBy("o_custkey", "rn")
      },
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
        |    CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INT) AS drnk
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
    ),

    // Frames: running sum (decimal-exact) + 4-row moving window. The moving
    // average is a raw double quotient of engine-identical inputs.
    "q21_window_frame" -> QDef(
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mov = ord.rowsBetween(-3, Window.currentRow)
        events(s, d)
          .withColumn("running_sum", round(sum(col("value").cast(Det.D)).over(run), 4).cast("double"))
          .withColumn("frame_sum", round(sum(col("value").cast(Det.D)).over(mov), 4).cast("double"))
          .withColumn("frame_cnt", count(lit(1)).over(mov))
          .withColumn("mov_avg", col("frame_sum") / col("frame_cnt"))
          .select("user_id", "event_id", "running_sum", "frame_sum", "frame_cnt", "mov_avg")
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id, running_sum, frame_sum, frame_cnt,
        |       frame_sum / frame_cnt AS mov_avg
        |FROM (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 4) AS DOUBLE) AS running_sum,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS frame_sum,
        |    COUNT(*) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_cnt
        |  FROM events) t
        |ORDER BY user_id, event_id""".stripMargin
    ),

    // lag/lead + exact integer milliseconds (SURVEY §2.2 trap: unix_millis
    // ↔ epoch_ms; both BIGINT, both truncate micros the same way).
    "q22_window_lag_lead" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("ms_since_prev", unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
          .select("user_id", "event_id", "event_type", "prev_type", "next_type", "ms_since_prev")
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id, event_type,
        |  lag(event_type) OVER w AS prev_type,
        |  lead(event_type) OVER w AS next_type,
        |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS ms_since_prev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin
    ),

    // Global top-k: TakeOrderedAndProject — no total sort at scale.
    "q23_topk" -> QDef(
      (s, d) =>
        orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
    ),

    // percent_rank is (rank-1)/(n-1): an integer ratio ⇒ identical doubles
    // raw, no rounding.
    "q24_ntile_pctrank" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
        orders(s, d)
          .withColumn("tile", ntile(4).over(w))
          .withColumn("pct", percent_rank().over(w))
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "tile", "pct")
          .orderBy("o_orderstatus", "o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS tile,
        |  percent_rank() OVER w AS pct
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin
    ),

    // ------------------------------------------------------ scalar functions
    "q25_string_funcs" -> QDef(
      (s, d) =>
        customer(s, d)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("upper_name"),
            lower(col("c_mktsegment")).as("lower_seg"),
            substring(col("c_name"), 1, 8).as("name_prefix"),
            length(col("c_name")).as("name_len"),
            concat(col("c_name"), lit("-"), col("c_mktsegment")).as("joined"),
            expr("replace(c_name, 'Customer', 'Cust')").as("replaced"),
            col("c_name").like("%1%").as("has_one"),
            split(col("c_name"), "#").getItem(1).as("num_part"),
            trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed")
          )
          .orderBy("c_custkey")
          .limit(100),
      """SELECT c_custkey,
        |  upper(c_name) AS upper_name,
        |  lower(c_mktsegment) AS lower_seg,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  concat(c_name, '-', c_mktsegment) AS joined,
        |  replace(c_name, 'Customer', 'Cust') AS replaced,
        |  c_name LIKE '%1%' AS has_one,
        |  split_part(c_name, '#', 2) AS num_part,
        |  trim(concat('  ', c_mktsegment, '  ')) AS trimmed
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin
    ),

    "q26_date_funcs" -> QDef(
      (s, d) =>
        orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dy"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
            datediff(to_date(lit("2000-01-01")), col("o_orderdate").cast("date")).as("days_to_y2k")
          )
          .orderBy("o_orderkey")
          .limit(200),
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dy,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin
    ),

    // abs/floor/ceil/sqrt/power/mod are exact or correctly-rounded IEEE ⇒
    // raw; ln/exp go through different libms ⇒ round(4) (tie probability
    // ~1e-11 per value — negligible at LIMIT 200).
    "q27_math_funcs" -> QDef(
      (s, d) =>
        lineitem(s, d)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_extendedprice"),
            col("l_quantity"),
            col("l_discount"),
            abs(col("l_extendedprice") - 30000.0).as("abs_dev"),
            floor(col("l_extendedprice")).as("floor_price"),
            ceil(col("l_extendedprice")).as("ceil_price"),
            sqrt(col("l_quantity")).as("sqrt_qty"),
            round(log(col("l_extendedprice")), 4).as("ln_price"),
            round(exp(col("l_discount")), 4).as("exp_disc"),
            pow(col("l_quantity"), 2).as("qty_sq"),
            (col("l_linenumber") % 3).as("ln_mod3")
          )
          .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_discount")
          .limit(200),
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_discount,
        |  abs(l_extendedprice - 30000.0) AS abs_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  sqrt(l_quantity) AS sqrt_qty,
        |  round(ln(l_extendedprice), 4) AS ln_price,
        |  round(exp(l_discount), 4) AS exp_disc,
        |  pow(l_quantity, 2) AS qty_sq,
        |  l_linenumber % 3 AS ln_mod3
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_discount
        |LIMIT 200""".stripMargin
    ),

    "q28_json_funcs" -> QDef(
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("k")).as("sum_k"),
            (sum(col("k")).cast("double") / count(lit(1))).as("avg_k")
          )
          .orderBy("event_type"),
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin
    ),

    "q29_case_coalesce" -> QDef(
      (s, d) =>
        events(s, d)
          .select(
            col("event_id"),
            when(col("value") < 50.0, "low")
              .when(col("value") < 150.0, "mid")
              .otherwise("high")
              .as("value_band"),
            nullif(col("event_type"), lit("error")).as("type_or_null"),
            coalesce(nullif(col("event_type"), lit("error")), lit("ERR")).as("type_fixed")
          )
          .orderBy("event_id")
          .limit(300),
      """SELECT event_id,
        |  CASE WHEN value < 50.0 THEN 'low'
        |       WHEN value < 150.0 THEN 'mid' ELSE 'high' END AS value_band,
        |  nullif(event_type, 'error') AS type_or_null,
        |  coalesce(nullif(event_type, 'error'), 'ERR') AS type_fixed
        |FROM events ORDER BY event_id LIMIT 300""".stripMargin
    ),

    // Array ops over the embedding column. Per-row sums use sequential
    // left folds on both engines (Spark `aggregate` HOF ↔ DuckDB
    // list_aggregate 'sum') — verified bit-identical, no decimal bridge
    // needed, and zero shuffles (pure per-row codegen'd work).
    "q30_array_funcs" -> QDef(
      (s, d) => {
        val e = col("embedding").cast("array<double>")
        def fsum(c: org.apache.spark.sql.Column) =
          aggregate(c, lit(0.0), (acc, x) => acc + x)
        embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("n_dims"),
            element_at(e, 1).as("first_el"),
            element_at(e, size(col("embedding"))).as("last_el"),
            fsum(slice(e, 1, 3)).as("sum_first3"),
            fsum(e).as("sum_all")
          )
          .orderBy("vec_id")
      },
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS n_dims,
        |  CAST(embedding[1] AS DOUBLE) AS first_el,
        |  CAST(embedding[len(embedding)] AS DOUBLE) AS last_el,
        |  list_aggregate(CAST(embedding[1:3] AS DOUBLE[]), 'sum') AS sum_first3,
        |  list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS sum_all
        |FROM embeddings ORDER BY vec_id""".stripMargin
    )
  )
}

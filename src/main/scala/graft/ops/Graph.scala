package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-7 graph operators: damped PageRank over the nation-level trade
  * graph and a recursive-CTE hierarchy rollup — the iterative-graph and
  * hierarchy-traversal surfaces (centrality, org/category rollups) beyond
  * the single-shot joins of q09–q16 and the connected-components loop of
  * q66.
  *
  * Determinism contract (CLAUDE.md): PageRank runs ENTIRELY in scaled
  * int64 space — double sums across groups are order-dependent, so ranks
  * are integers (initial mass 1e12/node) and every division is truncating
  * integer division, which Spark `DIV` and DuckDB `//` both define as
  * truncation (verified: -7 DIV 2 = -3 on both). The hierarchy rollup is
  * counts + the standard DECIMAL(18,4) money bridge.
  */
object Graph {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q103
    // PageRank (3 damped iterations, d=0.85) over the customer-nation →
    // supplier-nation trade graph, edge weight = lineitem count. The graph
    // is aggregated ONCE from the fact join (|nations|² <= 625 rows — the
    // iteration input is the REDUCED graph, never the fact table) and
    // localCheckpoint'ed so the 4-table join isn't replayed per iteration;
    // each iteration is then a broadcast-sized join + one aggregate. All
    // arithmetic is scaled-integer: per-edge contribution
    // (r·w) DIV wout, damping (85·Σ) DIV 100, teleport 0.15·1e12 — exact
    // and order-free, so partial aggregation/shuffles can't flake a bit.
    // At 100 TB the edge reduction is the only fact-table pass and rank
    // state stays |V|-sized; int64 headroom (mass·w ~ 5e16 here) moves to
    // DECIMAL(38,0) when |V|·w pushes products past 9e18.
    "q103_pagerank" -> QDef(
      (s, d) => {
        val edges = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        val outw = edges.groupBy("src").agg(sum("w").as("wout"))
        val en = edges.join(outw, "src")
          .select("src", "dst", "w", "wout")
          .localCheckpoint() // <= 625 rows; feeds all 3 iterations
        val nodes = nation(s, d).select(col("n_nationkey").as("nk"))
        var r = nodes.withColumn("r", lit(1000000000000L))
        for (_ <- 1 to 3) {
          val contrib = en.join(r, col("src") === col("nk"))
            .select(col("dst"), expr("(r * w) DIV wout").as("c"))
            .groupBy("dst").agg(sum("c").as("cin"))
          r = nodes.join(contrib, col("nk") === col("dst"), "left")
            .select(col("nk"),
              (lit(150000000000L) +
                expr("(85 * coalesce(cin, 0L)) DIV 100")).as("r"))
        }
        r.orderBy("nk")
      },
      """WITH e AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |en AS (SELECT e.src, e.dst, e.w, ow.wout
        |       FROM e JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS wout
        |                    FROM e GROUP BY 1) ow USING (src)),
        |n0 AS (SELECT n_nationkey AS nk, CAST(1000000000000 AS BIGINT) AS r
        |       FROM nation),
        |it1 AS (SELECT n.nk, CAST(150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS BIGINT) AS r
        |        FROM n0 n LEFT JOIN (
        |          SELECT en.dst AS nk, CAST(SUM((p.r * en.w) // en.wout) AS BIGINT) AS cin
        |          FROM n0 p JOIN en ON en.src = p.nk GROUP BY 1) c USING (nk)),
        |it2 AS (SELECT n.nk, CAST(150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS BIGINT) AS r
        |        FROM n0 n LEFT JOIN (
        |          SELECT en.dst AS nk, CAST(SUM((p.r * en.w) // en.wout) AS BIGINT) AS cin
        |          FROM it1 p JOIN en ON en.src = p.nk GROUP BY 1) c USING (nk)),
        |it3 AS (SELECT n.nk, CAST(150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS BIGINT) AS r
        |        FROM n0 n LEFT JOIN (
        |          SELECT en.dst AS nk, CAST(SUM((p.r * en.w) // en.wout) AS BIGINT) AS cin
        |          FROM it2 p JOIN en ON en.src = p.nk GROUP BY 1) c USING (nk))
        |SELECT nk, r FROM it3 ORDER BY nk""".stripMargin
    ),

    // --------------------------------------------------------------- q104
    // Recursive-CTE hierarchy rollup, run NATIVELY on both engines: the
    // customer table viewed as an implicit heap tree (parent(ck) =
    // floor((ck-1)/2), root ck=0) traversed with WITH RECURSIVE — Spark
    // 4's recursive CTE executes the same iterative-join text Catalyst-
    // side (UnionLoop), DuckDB replays it verbatim; per-level counts and
    // the DECIMAL(18,4) balance bridge aggregate the traversal. Depth of
    // node ck is floor(log2(ck+1)) in closed form — InvariantSpec pins the
    // traversal against it.
    //
    // LEVEL SKIPPING (round 9): each recursive step joins via the 4th
    // ancestor — parent∘parent∘parent∘parent(ck) = floor((ck-15)/16) for
    // ck ≥ 15 — with the anchor seeding depths 0–3 (ck ≤ 14) in closed
    // form. One UnionLoop iteration then advances FOUR tree levels, so a
    // depth-D tree needs ⌈(D-3)/4⌉+1 iterations instead of D (sf0.1's
    // 15 000-node tree: 4 jobs, was 14). At toy scale the per-iteration
    // job constant (~0.2 s) dominates recursive CTEs — measured round 8 —
    // and level skipping is the standard recursive-doubling answer; at
    // 100 TB each iteration is still a frontier-sized equi-join against
    // the 2-column pruned scan, just 4× fewer sync barriers. All ancestor
    // arithmetic is exact IEEE on both engines for ck < 2^53.
    "q104_recursive_hierarchy" -> QDef(
      (s, d) => s.sql(
        s"""WITH RECURSIVE h(ck, depth, bal) AS (
           |  SELECT c_custkey,
           |         CASE WHEN c_custkey = 0 THEN 0 WHEN c_custkey <= 2 THEN 1
           |              WHEN c_custkey <= 6 THEN 2 ELSE 3 END,
           |         c_acctbal
           |  FROM parquet.`$d/customer.parquet` WHERE c_custkey <= 14
           |  UNION ALL
           |  SELECT c.c_custkey, h.depth + 4, c.c_acctbal
           |  FROM parquet.`$d/customer.parquet` c
           |  JOIN h ON CAST(FLOOR((c.c_custkey - 15) / 16.0) AS BIGINT) = h.ck
           |  WHERE c.c_custkey >= 15)
           |SELECT depth, COUNT(*) AS n,
           |       CAST(ROUND(SUM(CAST(bal AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_bal
           |FROM h GROUP BY depth ORDER BY depth""".stripMargin),
      """WITH RECURSIVE h(ck, depth, bal) AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey = 0 THEN 0 WHEN c_custkey <= 2 THEN 1
        |              WHEN c_custkey <= 6 THEN 2 ELSE 3 END,
        |         c_acctbal
        |  FROM customer WHERE c_custkey <= 14
        |  UNION ALL
        |  SELECT c.c_custkey, h.depth + 4, c.c_acctbal
        |  FROM customer c
        |  JOIN h ON CAST(FLOOR((c.c_custkey - 15) / 16.0) AS BIGINT) = h.ck
        |  WHERE c.c_custkey >= 15)
        |SELECT depth, COUNT(*) AS n,
        |       CAST(ROUND(SUM(CAST(bal AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_bal
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin
    ),

    // --------------------------------------------------------------- q119
    // Degree distribution of the customer→orders bipartite graph,
    // INCLUDING the zero-degree customers a groupBy-only rollup silently
    // drops (left join from the customer spine). The shape every graph
    // workload profiles first: skew here decides salting/broadcast
    // choices downstream. Plan: orders aggregate BEFORE the join
    // (customer-sized, partial-agg'd), one equi-join on the spine, then
    // a tiny degree rollup + 1-row broadcast total. Counts exact int64;
    // share is one raw IEEE quotient.
    "q119_degree_hist" -> QDef(
      (s, d) => {
        val deg = orders(s, d).groupBy("o_custkey")
          .agg(count(lit(1)).as("degree"))
        val full = customer(s, d).select(col("c_custkey"))
          .join(deg, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("degree"), lit(0L)).as("degree"))
        full.groupBy("degree").agg(count(lit(1)).as("n_customers"))
          .crossJoin(broadcast(full.agg(count(lit(1)).as("total"))))
          .select(col("degree"), col("n_customers"),
            (col("n_customers").cast("double") / col("total").cast("double"))
              .as("share"))
          .orderBy("degree")
      },
      """WITH deg AS (SELECT o_custkey, COUNT(*) AS degree FROM orders
        |             GROUP BY 1),
        |spine AS (SELECT COALESCE(degree, 0) AS degree
        |          FROM customer LEFT JOIN deg ON c_custkey = o_custkey)
        |SELECT degree, COUNT(*) AS n_customers,
        |       CAST(COUNT(*) AS DOUBLE) /
        |         CAST((SELECT COUNT(*) FROM spine) AS DOUBLE) AS share
        |FROM spine GROUP BY 1 ORDER BY 1""".stripMargin
    )
  )
}

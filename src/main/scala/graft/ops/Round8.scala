package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 additions: the frequency-sketch family (Count-Min), the
  * correlated-LATERAL operator, and multiset (ALL) set semantics — three
  * operator classes the q01–q121 inventory didn't yet exercise.
  *
  * Determinism contract (CLAUDE.md): the CMS is pure int64 arithmetic on
  * the house hash family (no floats anywhere), LATERAL's per-group order
  * is made total by unique tie-break keys, and EXCEPT/INTERSECT ALL are
  * multiset operations on exact int64 projections.
  */
object Round8 {
  import Tables._

  private val P = 104729L // house prime (q46/q56 hash family)

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q122
    // Count-Min-Sketch accuracy audit: build a depth-4 × width-256 CMS
    // over the event stream keyed by user_id, then report estimate vs
    // exact for a deterministic probe set — the sketch-quality audit a
    // monitoring pipeline ships next to the sketch itself (the CMS twin
    // of q83's LSH-recall and q92's drift audits). CMS is THE bounded-
    // memory frequency summary at 100 TB: the counter table is d·w = 1024
    // rows regardless of stream size, built by one map-side-combinable
    // aggregate over (row, bucket); the estimate probe is a broadcast
    // join of the tiny counter table. Hash family h_i(u) =
    // ((4i+3)·u + 7i+5) mod P mod w — pure int64, identical in DuckDB,
    // and est >= exact is a STRUCTURAL guarantee (InvariantSpec locks it).
    "q122_cms_audit" -> QDef(
      (s, d) => {
        val rows = s.range(0, 4).toDF("i")
        val ev = events(s, d).select(col("user_id"))
        val counters = ev.crossJoin(rows)
          .select(col("i"),
            (((col("i") * 4 + 3) * col("user_id") + col("i") * 7 + 5) % P % 256)
              .as("bucket"))
          .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
          .where(col("user_id") % 97 === 0) // deterministic probe carve
        exact.crossJoin(rows)
          .select(col("user_id"), col("exact"), col("i"),
            (((col("i") * 4 + 3) * col("user_id") + col("i") * 7 + 5) % P % 256)
              .as("bucket"))
          .join(counters, Seq("i", "bucket"))
          .groupBy("user_id", "exact")
          .agg(min("c").as("est"))
          .select(col("user_id"), col("exact"), col("est"),
            (col("est") - col("exact")).as("overcount"))
          .orderBy("user_id")
      },
      s"""WITH ev AS (SELECT user_id FROM events),
         |counters AS (
         |  SELECT i, ((4*i+3)*user_id + 7*i+5) % $P % 256 AS bucket,
         |         COUNT(*) AS c
         |  FROM ev CROSS JOIN range(0, 4) h(i)
         |  GROUP BY 1, 2),
         |exact AS (SELECT user_id, COUNT(*) AS exact FROM ev
         |          GROUP BY 1 HAVING user_id % 97 = 0),
         |est AS (
         |  SELECT e.user_id, e.exact, MIN(c.c) AS est
         |  FROM exact e CROSS JOIN range(0, 4) h(i)
         |  JOIN counters c
         |    ON c.i = h.i
         |   AND c.bucket = ((4*h.i+3)*e.user_id + 7*h.i+5) % $P % 256
         |  GROUP BY 1, 2)
         |SELECT user_id, exact, est, est - exact AS overcount
         |FROM est ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q123
    // Correlated LATERAL top-k: each nation's top-3 customers by account
    // balance via a correlated LATERAL subquery with ORDER BY + LIMIT —
    // the "for each row, run this parameterized query" operator. Spark
    // decorrelates it (DecorrelateInnerQuery) into the rank-window plan a
    // hand-writer would build, so declaring it LATERAL costs nothing at
    // scale while exercising a whole analyzer/optimizer family the
    // inventory otherwise misses. Ties on the 2-decimal balances are
    // broken by c_custkey, making the per-nation order total.
    "q123_lateral_topk" -> QDef(
      (s, d) => s.sql(
        s"""SELECT n.n_name, t.ck, t.bal
           |FROM parquet.`$d/nation.parquet` n,
           |LATERAL (
           |  SELECT c_custkey AS ck, c_acctbal AS bal
           |  FROM parquet.`$d/customer.parquet` c
           |  WHERE c.c_nationkey = n.n_nationkey
           |  ORDER BY c_acctbal DESC, c_custkey
           |  LIMIT 3) t
           |ORDER BY n.n_name, t.bal DESC, t.ck""".stripMargin),
      """SELECT n.n_name, t.ck, t.bal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey AS ck, c_acctbal AS bal
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 3) t
        |ORDER BY n.n_name, t.bal DESC, t.ck""".stripMargin
    ),

    // --------------------------------------------------------------- q124
    // Multiset set-operations: EXCEPT ALL / INTERSECT ALL between two
    // overlapping lineitem carves on a deliberately collision-heavy int64
    // projection, rolled up to (op, key) counts. DISTINCT-flavored set ops
    // (q17–q19) can't express bag arithmetic ("how many copies survive");
    // Spark plans these as a single aggregate producing replicated rows
    // (no join), so the shape is one shuffle per side at any scale. The
    // count rollup keeps the declared output compact and the row ORDER
    // total on (op, ka, kb).
    "q124_except_intersect_all" -> QDef(
      (s, d) => {
        def carveA = lineitem(s, d).where(col("l_linenumber") % 2 === 0)
          .select((col("l_orderkey") % 97).as("ka"), (col("l_partkey") % 89).as("kb"))
        def carveB = lineitem(s, d).where(col("l_returnflag") === "R")
          .select((col("l_orderkey") % 97).as("ka"), (col("l_partkey") % 89).as("kb"))
        val ex = carveA.exceptAll(carveB)
          .groupBy("ka", "kb").agg(count(lit(1)).as("n"))
          .select(lit("except_all").as("op"), col("ka"), col("kb"), col("n"))
        val in = carveA.intersectAll(carveB)
          .groupBy("ka", "kb").agg(count(lit(1)).as("n"))
          .select(lit("intersect_all").as("op"), col("ka"), col("kb"), col("n"))
        ex.unionAll(in).orderBy("op", "ka", "kb")
      },
      """WITH a AS (SELECT l_orderkey % 97 AS ka, l_partkey % 89 AS kb
        |           FROM lineitem WHERE l_linenumber % 2 = 0),
        |b AS (SELECT l_orderkey % 97 AS ka, l_partkey % 89 AS kb
        |      FROM lineitem WHERE l_returnflag = 'R'),
        |ex AS (SELECT ka, kb, COUNT(*) AS n
        |       FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1, 2),
        |inx AS (SELECT ka, kb, COUNT(*) AS n
        |        FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1, 2)
        |SELECT 'except_all' AS op, ka, kb, n FROM ex
        |UNION ALL
        |SELECT 'intersect_all' AS op, ka, kb, n FROM inx
        |ORDER BY op, ka, kb""".stripMargin
    ),

    // --------------------------------------------------------------- q125
    // Lag-1 autocorrelation of the hourly event-count series per type —
    // the burstiness/seasonality screen a metrics pipeline runs before
    // forecasting (q111's exact-sum discipline applied to Pearson corr of
    // consecutive observations). Counts are exact int64; the five pair
    // sums run in DECIMAL(19,0)-operand space (products ≤ (38,0), DuckDB
    // int128 forced — the q90/q111 width rule) so numerator/denominator
    // are EXACT until one double cast each; sqrt and the final division
    // are correctly-rounded IEEE on both engines. Zero-variance series
    // are excluded by exact decimal compare. Plan: one scan, one (type,
    // hour) map-side-combinable aggregate, a 5-partition lag window over
    // the ~720-row-per-type series (series length is bounded by the time
    // span, not data volume — window granularity is safe here), one tiny
    // rollup.
    "q125_autocorr" -> QDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("hr")
        val dec = "decimal(19,0)"
        val hourly = events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("x"))
        hourly
          .withColumn("y", lead("x", 1).over(w))
          .where(col("y").isNotNull)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("x").cast(dec)).as("sx"),
            sum(col("y").cast(dec)).as("sy"),
            sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
            sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
            sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
          .where(col("n").cast(dec) * col("sxx") =!= col("sx") * col("sx") &&
            col("n").cast(dec) * col("syy") =!= col("sy") * col("sy"))
          .select(col("event_type"), col("n"),
            ((col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double"))))
              .as("autocorr"))
          .orderBy("event_type")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT event_type, x,
        |         lead(x) OVER (PARTITION BY event_type ORDER BY hr) AS y
        |  FROM hourly),
        |sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         SUM(CAST(x AS DECIMAL(19,0))) AS sx,
        |         SUM(CAST(y AS DECIMAL(19,0))) AS sy,
        |         SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
        |         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |         SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
        |  FROM pairs WHERE y IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |       CAST(CAST(n AS DECIMAL(19,0)) * sxy - sx * sy AS DOUBLE) /
        |         (sqrt(CAST(CAST(n AS DECIMAL(19,0)) * sxx - sx * sx AS DOUBLE)) *
        |          sqrt(CAST(CAST(n AS DECIMAL(19,0)) * syy - sy * sy AS DOUBLE)))
        |         AS autocorr
        |FROM sums
        |WHERE CAST(n AS DECIMAL(19,0)) * sxx <> sx * sx
        |  AND CAST(n AS DECIMAL(19,0)) * syy <> sy * sy
        |ORDER BY event_type""".stripMargin
    )
  )
}

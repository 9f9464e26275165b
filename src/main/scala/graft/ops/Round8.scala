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
    )
  )
}

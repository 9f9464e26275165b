package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 20: storage-engineering audits — data-layout pruning
  * effectiveness under a fixed predicate workload (q217, the
  * WORKLOAD-side complement of q128's zone-map bounds) and a
  * from-scratch Bloom-filter false-positive calibration (q218, the
  * measured-vs-theory audit behind q79's decontamination join).
  *
  * Determinism: everything zone/bloom is exact integer arithmetic
  * (day-diff blocks with a base date BEFORE the data so integer
  * division never sees a negative operand — Spark DIV truncates toward
  * zero while DuckDB // floors); q218's theory FPR is the one
  * transcendental, rounded once to 6 decimals (the q134 discipline).
  */
object Round10t {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q217
    // Layout pruning audit: the SAME orders table laid out two ways —
    // key-clustered files (block = o_orderkey DIV 64, what a naive
    // ingest produces) vs date-range partitions (block = day DIV 30,
    // the layout a date-predicate workload wants) — scored against 8
    // fixed one-month predicates: blocks touched (zone-map overlap),
    // rows scanned in those blocks, rows actually matching, and scan
    // efficiency. The measured argument for choosing a partition/
    // cluster key by workload, not by arrival order. Scale shape: one
    // rollup per layout to the block-zone table, an 8-row broadcast
    // predicate join (Range build — NLJ-gate bounded by construction),
    // and a ≤16-row final rollup; the exact matched-rows side is the
    // same 8-row broadcast against the orders scan.
    "q217_prune_audit" -> QDef(
      (s, d) => {
        val dd = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
          .cast("long")
        val rows = orders(s, d).select(col("o_orderkey"), dd.as("day"))
        val zones = rows
          .select(expr("o_orderkey DIV 64").as("block"), lit("key").as("layout"), col("day"))
          .unionByName(rows
            .select(expr("day DIV 30").as("block"), lit("date").as("layout"), col("day")))
          .groupBy("layout", "block")
          .agg(count(lit(1)).as("n_rows"), min("day").as("lo_d"), max("day").as("hi_d"))
        // predicate anchors derive from the data's own day range (the
        // driver regenerates testdata with shifting date vintages), so
        // all 8 one-month probes land inside the data at any vintage
        val preds = s.range(8)
          .crossJoin(broadcast(rows.agg(min("day").as("mn"), max("day").as("mx"))))
          .select(col("id").as("pred"),
            expr("mn + id * (mx - mn - 29) DIV 8").as("lo"),
            expr("mn + id * (mx - mn - 29) DIV 8 + 29").as("hi"))
        val touched = zones.join(broadcast(preds),
            col("lo_d") <= col("hi") && col("hi_d") >= col("lo"))
          .groupBy("layout", "pred")
          .agg(count(lit(1)).as("n_blocks_touched"),
            sum("n_rows").as("rows_scanned"))
        val matched = rows.join(broadcast(preds),
            col("day") >= col("lo") && col("day") <= col("hi"))
          .groupBy("pred").agg(count(lit(1)).as("rows_matched"))
        touched.join(matched, Seq("pred"))
          .select(col("layout"), col("pred"), col("n_blocks_touched"),
            col("rows_scanned"), col("rows_matched"),
            (col("rows_matched").cast("double") / col("rows_scanned"))
              .as("scan_efficiency"))
          .orderBy("layout", "pred")
      },
      """WITH rows_ AS (
        |  SELECT o_orderkey,
        |         CAST(date_diff('day', DATE '1990-01-01', o_orderdate)
        |           AS BIGINT) AS day
        |  FROM orders),
        |zones AS (
        |  SELECT layout, block, COUNT(*) AS n_rows,
        |         MIN(day) AS lo_d, MAX(day) AS hi_d
        |  FROM (SELECT o_orderkey // 64 AS block, 'key' AS layout, day FROM rows_
        |        UNION ALL
        |        SELECT day // 30 AS block, 'date' AS layout, day FROM rows_) u
        |  GROUP BY 1, 2),
        |preds AS (
        |  SELECT p AS pred,
        |         mn + (p * (mx - mn - 29)) // 8 AS lo,
        |         mn + (p * (mx - mn - 29)) // 8 + 29 AS hi
        |  FROM (SELECT unnest(generate_series(0, 7)) AS p) g
        |  CROSS JOIN (SELECT MIN(day) AS mn, MAX(day) AS mx FROM rows_) b),
        |touched AS (
        |  SELECT layout, pred, COUNT(*) AS n_blocks_touched,
        |         CAST(SUM(n_rows) AS BIGINT) AS rows_scanned
        |  FROM zones JOIN preds ON lo_d <= hi AND hi_d >= lo
        |  GROUP BY 1, 2),
        |matched AS (
        |  SELECT pred, COUNT(*) AS rows_matched
        |  FROM rows_ JOIN preds ON day >= lo AND day <= hi
        |  GROUP BY 1)
        |SELECT layout, CAST(pred AS BIGINT) AS pred, n_blocks_touched,
        |       rows_scanned, rows_matched,
        |       CAST(rows_matched AS DOUBLE) / rows_scanned AS scan_efficiency
        |FROM touched JOIN matched USING (pred)
        |ORDER BY layout, pred""".stripMargin
    ),

    // --------------------------------------------------------------- q218
    // Bloom false-positive calibration: hand-rolled k=3 Bloom filters at
    // three sizes over the even o_orderkey half, probed with the odd
    // half (disjoint by construction ⇒ every hit is a false positive),
    // measured FPR vs the (1 − e^{−kn/m})^k theory — how one picks m
    // before trusting a q79-style decontamination join. Scale shape:
    // per m the filter IS the distinct (m, pos) set — filter-sized, not
    // data-sized — built by a map-side 3× explode + distinct; the probe
    // is an equi-join on (m, pos) + a per-key all-3-present count. The
    // portable md5 hash family keeps both engines' bit positions
    // identical.
    "q218_bloom_fpr" -> QDef(
      (s, d) => {
        val ks = orders(s, d).select(col("o_orderkey").as("k"))
        def pos(i: Int) = conv(substring(md5(concat(col("k").cast("string"),
          lit(s"#h$i"))), 1, 15), 16, 10).cast("long") % col("m")
        val withM = ks.crossJoin(broadcast(
          s.range(3).select((lit(1024L) * pow(lit(4.0), col("id").cast("double"))
            .cast("long")).as("m"))))
        val bits = withM.where(col("k") % 2 === 0)
          .select(col("m"), explode(array(pos(0), pos(1), pos(2))).as("pos"))
          .distinct()
        val probes = withM.where(col("k") % 2 === 1)
          .select(col("m"), col("k"),
            explode(array(pos(0), pos(1), pos(2))).as("pos"))
        val fp = probes.join(bits, Seq("m", "pos"))
          .groupBy("m", "k").agg(count(lit(1)).as("hits"))
          .where(col("hits") === 3)
          .groupBy("m").agg(count(lit(1)).as("n_fp"))
        val base = withM.groupBy("m").agg(
          sum(when(col("k") % 2 === 0, 1L).otherwise(0L)).as("n_inserted"),
          sum(when(col("k") % 2 === 1, 1L).otherwise(0L)).as("n_probes"))
        val nbits = bits.groupBy("m").agg(count(lit(1)).as("bits_set"))
        base.join(nbits, Seq("m")).join(fp, Seq("m"), "left")
          .select(col("m"), col("n_inserted"), col("n_probes"),
            col("bits_set"), coalesce(col("n_fp"), lit(0L)).as("n_fp"))
          .withColumn("fpr",
            col("n_fp").cast("double") / col("n_probes"))
          .withColumn("theory_fpr", round(
            pow(lit(1.0) - exp((col("n_inserted") * -3).cast("double") / col("m")),
              3.0), 6))
          .orderBy("m")
      },
      """WITH ks AS (SELECT o_orderkey AS k FROM orders),
        |ms AS (SELECT CAST(1024 * power(4, i) AS BIGINT) AS m
        |       FROM (SELECT unnest(generate_series(0, 2)) AS i) g),
        |withm AS (SELECT k, m FROM ks CROSS JOIN ms),
        |bits AS (
        |  SELECT DISTINCT m, pos FROM (
        |    SELECT m, unnest([
        |      CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || '#h0'), 1, 15)) AS BIGINT) % m,
        |      CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || '#h1'), 1, 15)) AS BIGINT) % m,
        |      CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || '#h2'), 1, 15)) AS BIGINT) % m]) AS pos
        |    FROM withm WHERE k % 2 = 0) b),
        |probes AS (
        |  SELECT m, k, unnest([
        |      CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || '#h0'), 1, 15)) AS BIGINT) % m,
        |      CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || '#h1'), 1, 15)) AS BIGINT) % m,
        |      CAST(('0x' || substring(md5(CAST(k AS VARCHAR) || '#h2'), 1, 15)) AS BIGINT) % m]) AS pos
        |  FROM withm WHERE k % 2 = 1),
        |fp AS (
        |  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_fp FROM (
        |    SELECT p.m, p.k FROM probes p JOIN bits b ON p.m = b.m AND p.pos = b.pos
        |    GROUP BY p.m, p.k HAVING COUNT(*) = 3) f
        |  GROUP BY m),
        |base AS (
        |  SELECT m,
        |         CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
        |         CAST(SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_probes
        |  FROM withm GROUP BY 1),
        |nbits AS (SELECT m, COUNT(*) AS bits_set FROM bits GROUP BY 1)
        |SELECT base.m, n_inserted, n_probes, bits_set,
        |       COALESCE(n_fp, 0) AS n_fp,
        |       CAST(COALESCE(n_fp, 0) AS DOUBLE) / n_probes AS fpr,
        |       ROUND(power(1 - exp(CAST(n_inserted * -3 AS DOUBLE) / m), 3), 6)
        |         AS theory_fpr
        |FROM base JOIN nbits USING (m) LEFT JOIN fp ON base.m = fp.m
        |ORDER BY m""".stripMargin
    )
  )
}

package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-6 data-quality operators: table profiling (the ANALYZE/summary
  * pass every ingestion job runs before trusting a drop) and corpus drift
  * (the distribution monitor a continuously-ingesting pipeline alarms
  * on). Both are single-scan conditional aggregations.
  *
  * Determinism: counts/ndv are exact int64 (CAST-bridged where DuckDB
  * promotes); means use the decimal bridge; the drift metric is computed
  * in EXACT integer arithmetic (common-denominator L1) with exactly one
  * final double division — summing per-term double quotients would be
  * order-dependent.
  */
object Profiling {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // ---------------------------------------------------------------- q89
    // Table profile of the documents corpus: row/ndv/null counts, length
    // extremes and mean — one scan, one aggregate. Exact COUNT(DISTINCT)
    // is the deliberate choice at profile time (a profile is run once and
    // cached); q54 documents the approx_count_distinct escape hatch for
    // always-on variants. Multiple distinct aggregates plan via Expand
    // (k× row replication pre-shuffle) — acceptable for k=2 here, and the
    // reason the profile doesn't ask for ndv of every column.
    "q89_profile" -> QDef(
      (s, d) => documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("ndv_lang"),
        countDistinct(col("source")).as("ndv_source"),
        count(when(col("text").isNull, 1)).as("n_null_text"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        Det.davg(col("n_chars")).as("mean_chars")),
      s"""SELECT COUNT(*) AS n_docs,
         |  COUNT(DISTINCT lang) AS ndv_lang,
         |  COUNT(DISTINCT source) AS ndv_source,
         |  COUNT(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
         |  MIN(n_chars) AS min_chars,
         |  MAX(n_chars) AS max_chars,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  ${Det.sqlDavg("n_chars")} AS mean_chars
         |FROM documents""".stripMargin
    ),

    // ---------------------------------------------------------------- q90
    // Corpus drift: L1 distance between the token distributions of two
    // corpus halves (doc_id parity stands in for yesterday/today) — the
    // alarm metric of a continuously-ingesting pipeline. ONE corpus scan:
    // the exploded token table is MATERIALIZED (the q46 shared-subplan
    // pattern) so the per-token frequency table and the 1-row totals both
    // derive from it instead of re-exploding the corpus — exactly how a
    // production monitor runs off its token-count table. Per-token counts
    // for both halves are conditional counts in a single groupBy (no join
    // of two frequency tables); totals join back as a 1-row broadcast.
    // The L1 sum runs in EXACT integer space — each operand is cast to
    // DECIMAL(19,0) BEFORE the multiply so the products (DECIMAL(38,0) in
    // both engines) cannot overflow int64 at corpus scale; one final double
    // division by T_a*T_b — because a sum of per-term double quotients
    // would depend on addition order. DECIMAL(19,0) operands, not (38,0):
    // DuckDB sizes a decimal product at w1+w2 capped at 38 and rejects
    // wider operands at bind time.
    "q90_corpus_drift" -> QDef(
      (s, d) => {
        val toks = documents(s, d)
          .select((col("doc_id") % 2).as("half"),
            explode(split(col("text"), " ")).as("tok"))
          .localCheckpoint() // feeds per-token counts AND totals: scan once
        val perTok = toks.groupBy("tok").agg(
          count(when(col("half") === 0, 1)).as("c_a"),
          count(when(col("half") === 1, 1)).as("c_b"))
        val totals = toks.agg(
          count(when(col("half") === 0, 1)).as("t_a"),
          count(when(col("half") === 1, 1)).as("t_b"))
        perTok.crossJoin(totals) // 1-row side: broadcast, never a shuffle
          .agg(
            sum(abs(col("c_a").cast("decimal(19,0)") * col("t_b").cast("decimal(19,0)")
              - col("c_b").cast("decimal(19,0)") * col("t_a").cast("decimal(19,0)")))
              .as("l1_num"),
            max(col("t_a")).as("t_a"), max(col("t_b")).as("t_b"),
            count(lit(1)).as("n_terms"))
          .select(
            col("n_terms"), col("t_a"), col("t_b"),
            (col("l1_num").cast("double") /
              (col("t_a").cast("double") * col("t_b").cast("double"))).as("l1"))
      },
      """WITH toks AS (SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |per_tok AS (SELECT tok,
        |              COUNT(CASE WHEN half = 0 THEN 1 END) AS c_a,
        |              COUNT(CASE WHEN half = 1 THEN 1 END) AS c_b
        |            FROM toks GROUP BY 1),
        |totals AS (SELECT COUNT(CASE WHEN half = 0 THEN 1 END) AS t_a,
        |                  COUNT(CASE WHEN half = 1 THEN 1 END) AS t_b FROM toks)
        |SELECT COUNT(*) AS n_terms, MAX(t_a) AS t_a, MAX(t_b) AS t_b,
        |  CAST(SUM(ABS(CAST(c_a AS DECIMAL(19,0)) * CAST(t_b AS DECIMAL(19,0))
        |              - CAST(c_b AS DECIMAL(19,0)) * CAST(t_a AS DECIMAL(19,0)))) AS DOUBLE)
        |    / (CAST(MAX(t_a) AS DOUBLE) * CAST(MAX(t_b) AS DOUBLE)) AS l1
        |FROM per_tok, totals""".stripMargin
    ),

    // ---------------------------------------------------------------- q92
    // SKETCHED corpus drift — the always-on form of q90. A continuous
    // monitor cannot hold the full vocabulary; instead it tracks only the
    // token TYPES landing in a deterministic 1-in-7 portable-hash carve
    // (md5 of the token, the q69/q83 sampling family) and computes the
    // same common-denominator L1 over that subspace, with totals taken
    // over the SAMPLED occurrences so the sampled counts form a proper
    // distribution. State is |vocab|/7 counters; the carve is a pure
    // projection (filter BEFORE the aggregation shuffle, so the monitor
    // also shuffles 1/7 of the occurrences); re-running, re-partitioning,
    // or growing the corpus never changes which types are tracked —
    // unlike a CMS, every retained count is exact and DuckDB-replayable.
    // SCALE.md §"Sketched drift" carries the design note.
    "q92_sketch_drift" -> QDef(
      (s, d) => {
        val toks = documents(s, d)
          .select((col("doc_id") % 2).as("half"),
            explode(split(col("text"), " ")).as("tok"))
          .where(conv(substring(md5(col("tok")), 1, 15), 16, 10)
            .cast("long") % 7 === 0)
          .localCheckpoint() // feeds per-token counts AND totals: scan once
        val perTok = toks.groupBy("tok").agg(
          count(when(col("half") === 0, 1)).as("c_a"),
          count(when(col("half") === 1, 1)).as("c_b"))
        val totals = toks.agg(
          count(when(col("half") === 0, 1)).as("t_a"),
          count(when(col("half") === 1, 1)).as("t_b"))
        perTok.crossJoin(totals)
          .agg(
            sum(abs(col("c_a").cast("decimal(19,0)") * col("t_b").cast("decimal(19,0)")
              - col("c_b").cast("decimal(19,0)") * col("t_a").cast("decimal(19,0)")))
              .as("l1_num"),
            max(col("t_a")).as("t_a"), max(col("t_b")).as("t_b"),
            count(lit(1)).as("n_terms"))
          .select(
            col("n_terms"), col("t_a"), col("t_b"),
            (col("l1_num").cast("double") /
              (col("t_a").cast("double") * col("t_b").cast("double"))).as("l1"))
      },
      """WITH toks AS (
        |  SELECT half, tok FROM (
        |    SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) u
        |  WHERE CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 7 = 0),
        |per_tok AS (SELECT tok,
        |              COUNT(CASE WHEN half = 0 THEN 1 END) AS c_a,
        |              COUNT(CASE WHEN half = 1 THEN 1 END) AS c_b
        |            FROM toks GROUP BY 1),
        |totals AS (SELECT COUNT(CASE WHEN half = 0 THEN 1 END) AS t_a,
        |                  COUNT(CASE WHEN half = 1 THEN 1 END) AS t_b FROM toks)
        |SELECT COUNT(*) AS n_terms, MAX(t_a) AS t_a, MAX(t_b) AS t_b,
        |  CAST(SUM(ABS(CAST(c_a AS DECIMAL(19,0)) * CAST(t_b AS DECIMAL(19,0))
        |              - CAST(c_b AS DECIMAL(19,0)) * CAST(t_a AS DECIMAL(19,0)))) AS DOUBLE)
        |    / (CAST(MAX(t_a) AS DOUBLE) * CAST(MAX(t_b) AS DOUBLE)) AS l1
        |FROM per_tok, totals""".stripMargin
    ),

    // --------------------------------------------------------------- q111
    // Per-user value trend: least-squares slope/intercept of value over
    // time — the burst/decay detector behind q93's point anomalies. The
    // closed form needs ONLY the five per-group sums (n, Σx, Σy, Σxy,
    // Σx²), i.e. one scan + one hash aggregate, map-side combined — no
    // window, no second pass. Every sum runs EXACT: x = int64 seconds in
    // 19-wide decimals (sec² overflows int64 after 3 rows, and DuckDB
    // multiplies int64-BACKED decimals in int64 physical — operands must
    // be >= DECIMAL(19) to force int128, the q90 lesson; kept narrow
    // enough that every product width w1+w2 <= 38 binds), y through the
    // DECIMAL(18,4) bridge, and the closed-form
    // numerator/denominator stay decimal until ONE double cast each; the
    // slope division and the intercept's multiply-subtract-divide chain
    // are then identical IEEE sequences on both engines. Degenerate
    // groups (zero time variance) are excluded by an exact decimal
    // compare. Operand widths are sized so every product fits DuckDB's
    // 38-digit cap (w1+w2 <= 38, bind-time checked).
    "q111_trend_slope" -> QDef(
      (s, d) => {
        events(s, d)
          .withColumn("sec", expr("unix_micros(ts) DIV 1000000"))
          .groupBy("user_id")
          .agg(
            count(lit(1)).cast("decimal(8,0)").as("n"),
            sum(col("sec").cast("decimal(19,0)")).cast("decimal(19,0)").as("sx"),
            sum(col("value").cast(graft.Det.D)).cast("decimal(12,4)").as("sy"),
            sum(col("sec").cast("decimal(19,0)") * col("value").cast(graft.Det.D))
              .cast("decimal(20,4)").as("sxy"),
            sum(col("sec").cast("decimal(19,0)") * col("sec").cast("decimal(19,0)"))
              .cast("decimal(25,0)").as("sxx"))
          .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
          .where(col("den") =!= lit(0))
          .withColumn("slope",
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              col("den").cast("double"))
          .withColumn("intercept",
            (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
              col("n").cast("double"))
          .select("user_id", "slope", "intercept")
          .orderBy("user_id")
      },
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec, value
        |            FROM events),
        |s AS (SELECT user_id,
        |        CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
        |        CAST(SUM(CAST(sec AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sx,
        |        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(12,4)) AS sy,
        |        CAST(SUM(CAST(sec AS DECIMAL(19,0)) * CAST(value AS DECIMAL(18,4)))
        |          AS DECIMAL(20,4)) AS sxy,
        |        CAST(SUM(CAST(sec AS DECIMAL(19,0)) * CAST(sec AS DECIMAL(19,0)))
        |          AS DECIMAL(25,0)) AS sxx
        |      FROM ev GROUP BY 1),
        |f AS (SELECT user_id, n, sx, sy, sxy, sxx, n * sxx - sx * sx AS den
        |      FROM s WHERE n * sxx - sx * sx <> 0)
        |SELECT user_id,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(den AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE) -
        |    (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(den AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        |FROM f ORDER BY user_id""".stripMargin
    ),

    // --------------------------------------------------------------- q112
    // Benford first-digit audit of order totals — the classic fabricated-
    // numbers screen. The determinism trap is digit EXTRACTION, not the
    // counting: log10/pow are libm (banned), double→string formatting
    // differs across engines, and double→int casts TRUNCATE in Spark but
    // ROUND in DuckDB. The portable path: DECIMAL(18,2) bridge (exact on
    // the 2-decimal money data) → ×100 → BIGINT (exact) → first char of
    // the INTEGER's string form, which both engines render identically.
    // One scan, one 9-row aggregate; share is one raw quotient against
    // the 1-row broadcast total.
    "q112_benford" -> QDef(
      (s, d) => {
        val digits = orders(s, d)
          .select((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint").as("cents"))
          .select(substring(col("cents").cast("string"), 1, 1)
            .cast("int").as("digit"))
        val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
        counts
          .crossJoin(broadcast(digits.agg(count(lit(1)).as("total"))))
          .select(col("digit"), col("n"),
            (col("n").cast("double") / col("total").cast("double")).as("share"))
          .orderBy("digit")
      },
      """WITH d AS (SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |                 * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |           FROM orders),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
        |SELECT digit, n,
        |       CAST(n AS DOUBLE) / CAST((SELECT COUNT(*) FROM d) AS DOUBLE) AS share
        |FROM c ORDER BY digit""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 3: tokenizer fertility (q165), the weighted-interleave
  * mix schedule (q166), frequency-capped dedup sampling (q167), label
  * rebalancing (q168) — four curation ops a training-data loader runs —
  * plus an event burst detector (q169) built on all-integer window
  * arithmetic.
  *
  * Determinism: exact long counts; every ratio a raw IEEE quotient of
  * identically-derived operands; q169's burst predicate is an INTEGER
  * cross-multiplication (no doubles at all); every window keyed; total
  * output orders.
  */
object Round10c {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q165
    // Tokenizer fertility per language: BPE-pretokenizer tokens per
    // whitespace token (the "how many subwords does this language cost"
    // metric a tokenizer budget is planned around; per-doc surface: q61).
    // One map-side-combinable aggregate over per-doc regexp counts.
    "q165_bpe_fertility" -> QDef(
      (s, d) => {
        val pat = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9']+"
        documents(s, d)
          .select(
            col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_ws"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_ws").as("ws_toks"),
            sum("n_bpe").as("bpe_toks"))
          .withColumn("fertility", col("bpe_toks") / col("ws_toks"))
          .orderBy("lang")
      },
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS ws_toks,
        |       CAST(SUM(CAST(len(regexp_extract_all(text,
        |         '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9'']+')) AS BIGINT)) AS BIGINT)
        |         AS bpe_toks,
        |       CAST(SUM(CAST(len(regexp_extract_all(text,
        |         '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9'']+')) AS BIGINT)) AS BIGINT)
        |       / CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
        |         AS fertility
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q166
    // Weighted-interleave mix schedule: every doc gets a deterministic
    // training-order key rn/share (rn = the doc's rank within its source,
    // share = the source's corpus fraction) — sources emit proportionally
    // to their share, interleaved smoothly (the low-discrepancy schedule a
    // mixture loader materializes; q74 computes the target weights, this
    // emits the order). First 500 positions shown. Scale: one keyed
    // window (by source) + a broadcast of per-source counts; the global
    // sort exists only to bound the preview output.
    "q166_mix_schedule" -> QDef(
      (s, d) => {
        val docs = documents(s, d)
        val szs = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
        val tot = docs.agg(count(lit(1)).as("n_total"))
        docs.select("doc_id", "source")
          .withColumn("rn",
            row_number().over(Window.partitionBy("source").orderBy("doc_id")))
          .join(broadcast(szs), "source")
          .crossJoin(broadcast(tot))
          .withColumn("share", col("n_src") / col("n_total"))
          .withColumn("pos_key", col("rn") / col("share"))
          .select("doc_id", "source", "rn", "n_src", "pos_key")
          .orderBy(col("pos_key"), col("source"), col("doc_id"))
          .limit(500)
      },
      """WITH szs AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_total FROM documents),
        |r AS (SELECT doc_id, source,
        |        CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS rn
        |      FROM documents)
        |SELECT doc_id, r.source, rn, n_src,
        |       rn / (n_src / n_total) AS pos_key
        |FROM r JOIN szs ON r.source = szs.source CROSS JOIN tot
        |ORDER BY pos_key, r.source, doc_id LIMIT 500""".stripMargin
    ),

    // --------------------------------------------------------------- q167
    // Frequency-capped sampling: keep at most K=2 docs per (lang, 8-token
    // prefix) block — the "soft dedup" pass that caps template families
    // without exact-match semantics (block unit shared with q137's
    // sorted-neighborhood key family). Keeps are deterministic (lowest
    // doc_id). Output is the per-source kept/dropped audit. Scale: one
    // keyed window over blocks + one keyed rollup; block width is a
    // test-scale constant like q137's.
    "q167_cap_duplicates" -> QDef(
      (s, d) => {
        val blocked = documents(s, d)
          .withColumn("blk", array_join(slice(split(col("text"), " "), 1, 8), " "))
          .withColumn("rn",
            row_number().over(
              Window.partitionBy("lang", "blk").orderBy("doc_id")))
        blocked
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("rn") <= 2, 1)).as("n_kept"))
          .withColumn("n_capped", col("n_docs") - col("n_kept"))
          .withColumn("keep_rate", col("n_kept") / col("n_docs"))
          .orderBy("source")
      },
      """WITH b AS (
        |  SELECT source,
        |         row_number() OVER (
        |           PARTITION BY lang, array_to_string(string_split(text, ' ')[1:8], ' ')
        |           ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |       COUNT(CASE WHEN rn <= 2 THEN 1 END) AS n_kept,
        |       COUNT(*) - COUNT(CASE WHEN rn <= 2 THEN 1 END) AS n_capped,
        |       COUNT(CASE WHEN rn <= 2 THEN 1 END) / COUNT(*) AS keep_rate
        |FROM b GROUP BY 1 ORDER BY source""".stripMargin
    ),

    // --------------------------------------------------------------- q168
    // Label rebalancing audit: undersample every embedding label down to
    // the minority-label count (deterministic keeps: lowest vec_id) — the
    // class-balance step before classifier training (q42's kNN). Output
    // is the per-label keep/drop plan. Scale: one keyed window + a 1-row
    // broadcast of the global minimum.
    "q168_label_balance" -> QDef(
      (s, d) => {
        val ranked = embeddings(s, d)
          .select(col("label"), col("vec_id"))
          .withColumn("rn",
            row_number().over(Window.partitionBy("label").orderBy("vec_id")))
        val target = ranked.groupBy("label").agg(count(lit(1)).as("n"))
          .agg(min("n").as("target"))
        ranked
          .crossJoin(broadcast(target))
          .groupBy("label")
          .agg(
            count(lit(1)).as("n_vecs"),
            count(when(col("rn") <= col("target"), 1)).as("n_kept"))
          .withColumn("n_dropped", col("n_vecs") - col("n_kept"))
          .withColumn("keep_rate", col("n_kept") / col("n_vecs"))
          .orderBy("label")
      },
      """WITH r AS (SELECT label, vec_id,
        |             row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        |           FROM embeddings),
        |t AS (SELECT MIN(n) AS target FROM
        |        (SELECT label, COUNT(*) AS n FROM r GROUP BY 1) c)
        |SELECT label, COUNT(*) AS n_vecs,
        |       COUNT(CASE WHEN rn <= target THEN 1 END) AS n_kept,
        |       COUNT(*) - COUNT(CASE WHEN rn <= target THEN 1 END) AS n_dropped,
        |       COUNT(CASE WHEN rn <= target THEN 1 END) / COUNT(*) AS keep_rate
        |FROM r CROSS JOIN t GROUP BY 1 ORDER BY label""".stripMargin
    ),

    // --------------------------------------------------------------- q169
    // Event burst detector: per event_type, flag hours whose count exceeds
    // 1.5× the trailing-5-hour average (hour buckets: the testdata's event
    // density leaves minute buckets at ~1 event/minute at the smallest SF,
    // where no spike is expressible — probed; the 1.5× threshold fires at
    // every SF). The predicate is the INTEGER cross-multiplication
    // 2·cnt·trail_n > 3·trail_sum — no doubles anywhere, so cross-engine
    // parity is trivial. Requires ≥3 trailing hours of history. Scale:
    // hour pre-aggregation is map-side combinable; the frame window runs
    // per event_type over hour-count rows (keyed, bounded by the time
    // range — never data-sized partitions).
    "q169_burst_detect" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(-5, -1)
        events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("trail_sum", sum("cnt").over(w))
          .withColumn("trail_n", count(lit(1)).over(w))
          .where(col("trail_n") >= 3 &&
            col("cnt") * col("trail_n") * 2 > col("trail_sum") * 3)
          .select("event_type", "hour", "cnt", "trail_sum", "trail_n")
          .orderBy("event_type", "hour")
      },
      """WITH m AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |             COUNT(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hour, cnt,
        |        SUM(cnt) OVER (PARTITION BY event_type ORDER BY hour
        |                       ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS trail_sum,
        |        COUNT(*) OVER (PARTITION BY event_type ORDER BY hour
        |                       ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS trail_n
        |      FROM m)
        |SELECT event_type, hour, cnt,
        |       CAST(trail_sum AS BIGINT) AS trail_sum, trail_n
        |FROM w
        |WHERE trail_n >= 3 AND cnt * trail_n * 2 > trail_sum * 3
        |ORDER BY event_type, hour""".stripMargin
    )
  )
}

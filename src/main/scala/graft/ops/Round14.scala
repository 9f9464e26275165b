package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-14 additions — the two lifecycle/tuning audits the round-13
  * verdict named as the remaining oracle-checkable gaps:
  *
  *  - q251 chunk-store lifecycle audit: s37's compaction semantics
  *    (latest-version liveness, surgical CDC reclaim) as a DECLARED query
  *    under the DuckDB oracle. s37 itself is spec-locked only (it is a
  *    filesystem ingest loop); this query computes the same live/reclaimed
  *    partition from `documents` plus a deterministic re-ingest delta, so
  *    the lifecycle math gets the same hash gate as everything else.
  *  - q252 MinHash-LSH band operating curve: the text-dedup analog of
  *    q248 (nprobe) / q249 (shortlist width) — pair-recall AND candidate
  *    precision as a function of band count at a FIXED 16-hash signature
  *    budget. The s-curve every dedup deployment tunes, declared as one
  *    plan sharing one minhash table across all four (bands × rows)
  *    configurations.
  *
  * Reference provenance: the reference checkout is empty (SURVEY.md §0);
  * both queries extend this repo's own q236/q83 constructions.
  */
object Round14 {
  import Tables._

  /** q251's deterministic re-ingest delta: docs with doc_id % 7 = 3 and
    * ≥ 9 tokens, the 5th token replaced by 'xedit' — a mid-doc edit, so
    * CDC resync is exercised (boundaries re-align a few tokens after the
    * edit window; only the chunks overlapping it change). Shared with
    * Round14Spec's s37 ingest replay. */
  private[graft] def editedDelta(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.withColumn("tk", split(col("text"), " "))
      .where(col("doc_id") % 7 === 3 && size(col("tk")) >= 9)
      .select(col("doc_id"), col("source"),
        array_join(concat(slice(col("tk"), 1, 4), array(lit("xedit")),
          expr("slice(tk, 6, size(tk) - 5)")), " ").as("text"))

  /** One version's chunk refs: the q236 chunker keyed by content hash. */
  private[graft] def chunkRefs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Round12c.cdcChunkTable(docs)
      .withColumn("ck", md5(col("ctext")))
      .select("doc_id", "source", "ck", "ctoks")

  /** q251's lifecycle partition: (liveRefs, allRefs, deadCk) for the
    * two-version (base, editedDelta) store — exactly s37's compaction
    * rule restated as one batch plan (Round14Spec locks deadCk ==
    * compactChunkStore's reclaimed set and liveRefs.ck == the compacted
    * store, on the same delta). */
  private[graft] def lifecycleParts(docs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val edited = editedDelta(docs)
    val c0 = chunkRefs(docs).localCheckpoint()   // latest-ref filter + all refs
    val c1 = chunkRefs(edited).localCheckpoint() // live refs + all refs
    val liveRefs = c0.join(edited.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionAll(c1)
      .localCheckpoint() // live-ck set + per-source live rollup
    val allRefs = c0.unionAll(c1)
    val deadCk = allRefs.select("ck").distinct()
      .join(liveRefs.select("ck").distinct(), Seq("ck"), "left_anti")
    (liveRefs, allRefs, deadCk)
  }

  private val P = 104729L

  /** The q252 (bands × rows/band) levels at the fixed 16-hash budget —
    * ONE definition shared by bandCurveParts (signature construction) and
    * the q252 query body (output labeling), so the reported rows_per_band
    * can never drift from the signatures actually measured (round-14
    * ADVICE). The oracle's VALUES list replays it verbatim. */
  private[graft] val bandLevels: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2), (16, 1))

  /** The shared q252/q253 carve: char-4-gram shingle sets per doc (the
    * q65 basis — the 31-WORD vocabulary makes word-token similarity
    * degenerate; see the q252 plan-shape note). Checkpointed: every
    * consumer self-joins it. */
  private[graft] def shingleDocs(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    documents(s, d).where(col("doc_id") % 7 === 0)
      .where(length(col("text")) >= 4) // sequence(1, len-3) must ascend
      .select(col("doc_id"), col("lang"),
        array_distinct(expr(
          "transform(sequence(1, length(text) - 3), i -> substring(text, i, 4))"))
          .as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .localCheckpoint() // feeds both sides of the all-pairs join

  /** 16 minhashes over dictionary-ranked shingle ids, as ONE array column
    * — since round 15 the SAME family as the production
    * `LlmExt2.minhashArr` (69621-power multipliers; this query is where
    * the degeneracy of the old small-multiplier family was first
    * measured, and the mhfamily ScaleCurve then exposed the shared-factor
    * correlation of the 48271·(i+1) intermediate — see minhashArr's
    * family note). Staged per the HOF discipline: the array is one
    * projection of the plain `ids` attribute. */
  private[graft] def shingleMinhash(docsT: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = docsT.select(col("doc_id"), col("lang"),
      explode(col("toks")).as("tok"))
    toks.join(LlmExt2.tokenDict(toks), "tok")
      .groupBy("doc_id", "lang")
      .agg(collect_list(col("tid").cast("long")).as("ids"))
      .withColumn("mh", LlmExt2.minhashArr(col("ids")))
      .select("doc_id", "lang", "mh")
  }

  /** q252's shared parts: (exact truth pairs, per-level candidate pairs).
    * Factored so Round14Spec can lock the candidate-NESTING property
    * (cand at b bands ⊆ cand at 2b) set-for-set, not just the counts. */
  private[graft] def bandCurveParts(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    val coefs = array(Seq(1L, 131L, 17161L, 248085L, 499039L, 373914L,
      982590L, 718906L).map(lit): _*)
    val levels = bandLevels.toDF("nbands", "rpb")
    val docsT = shingleDocs(s, d)
    // 32-way spread of the probe side (q83/q97 lesson: the checkpointed
    // doc table is byte-small, AQE coalesces to one task otherwise)
    val exact = docsT.repartition(32).as("a")
      .join(docsT.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
        size(array_intersect(col("a.toks"), col("b.toks"))).cast("long").as("n_common"))
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .where(col("jaccard") >= 0.4)
      .select("doc_a", "doc_b")
      .localCheckpoint() // n_exact + the per-level hit semi-join
    val mh = shingleMinhash(docsT)
      .select(col("doc_id"), col("lang"), posexplode(col("mh")))
      .select(col("doc_id"), col("lang"), col("pos").cast("long").as("i"),
        col("col").as("mh"))
    val sig = mh.crossJoin(broadcast(levels))
      .groupBy(col("doc_id"), col("lang"), col("nbands"),
        expr("i div rpb").as("band"))
      .agg(sum(col("mh") * element_at(coefs,
        (col("i") % col("rpb")).cast("int") + 1)).as("sig"))
      .localCheckpoint() // both sides of the per-level bucket self-join
    val cand = sig.as("x")
      .join(sig.as("y"), col("x.nbands") === col("y.nbands") &&
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.nbands").as("nbands"),
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // NOT checkpointed (r15 opt): q252 now counts candidates and hits in
    // ONE left-join aggregation pass, so this has a single consumer there
    // — an eager checkpoint job was pure barrier latency (the Round10n
    // single-consumer rule; Round14Spec re-derives it cheaply).
    (exact, cand)
  }

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q251
    // Chunk-store lifecycle: ingest v0 = every document, then re-ingest a
    // deterministic edited delta (docs with doc_id % 7 = 3 and ≥ 9 tokens;
    // the 5th token replaced by 'xedit' — a mid-doc edit, so CDC resync is
    // exercised: boundaries re-align a few tokens after the edit window
    // and only the chunks overlapping it change). Store = every ck ever
    // admitted (both versions); live = cks referenced by each doc's LATEST
    // version (v1 for edited docs, v0 otherwise); reclaimed = store − live
    // — exactly s37's compaction rule (streaming/Demos.compactChunkStore),
    // restated as one batch plan. Per-source attribution: a ck counts for
    // source s if any of s's refs (latest refs for live, any-version refs
    // for reclaimed) name it — a shared chunk can count for two sources,
    // deterministically in both engines. Scale shape: two chunker passes
    // (each one doc-partitioned window), then hash joins/rollups keyed on
    // ck and (source, ck) — no global windows, no driver loops; at 100 TB
    // the distinct-(source, ck) rollups are plain map-side-combinable
    // shuffles and the dead-ck anti-join is ck-hash-partitioned.
    "q251_chunk_lifecycle" -> QDef(
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("source"), col("text"))
        val (liveRefs, allRefs, deadCk) = lifecycleParts(docs)
        val liveSrc = liveRefs.select("source", "ck", "ctoks").distinct()
          .groupBy("source")
          .agg(count(lit(1)).as("live_chunks"), sum("ctoks").as("live_toks"))
        val deadSrc = allRefs.select("source", "ck", "ctoks").distinct()
          .join(deadCk, Seq("ck"), "left_semi")
          .groupBy("source")
          .agg(count(lit(1)).as("reclaimed_chunks"),
            sum("ctoks").as("reclaimed_toks"))
        liveSrc.join(deadSrc, Seq("source"), "left")
          .select(col("source"), col("live_chunks"), col("live_toks"),
            coalesce(col("reclaimed_chunks"), lit(0L)).as("reclaimed_chunks"),
            coalesce(col("reclaimed_toks"), lit(0L)).as("reclaimed_toks"))
          .orderBy("source")
      },
      """WITH base AS (SELECT doc_id, source, text FROM documents),
        |ed AS (
        |  SELECT doc_id, source,
        |         array_to_string(
        |           string_split(text, ' ')[1:4] || ['xedit']
        |             || string_split(text, ' ')[6:], ' ') AS text
        |  FROM base
        |  WHERE doc_id % 7 = 3 AND len(string_split(text, ' ')) >= 9),
        |alld AS (SELECT doc_id, source, text, 0 AS ver FROM base
        |         UNION ALL SELECT doc_id, source, text, 1 AS ver FROM ed),
        |toks AS (
        |  SELECT doc_id, ver, source, unnest(string_split(text, ' ')) AS tok,
        |         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
        |  FROM alld),
        |c AS (SELECT doc_id, ver, source, p, tok,
        |        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS code
        |      FROM toks),
        |h AS (SELECT *, code + 3 * lag(code, 1) OVER w
        |        + 9 * lag(code, 2) OVER w + 27 * lag(code, 3) OVER w AS rh
        |      FROM c WINDOW w AS (PARTITION BY doc_id, ver ORDER BY p)),
        |b AS (SELECT *, CASE WHEN p >= 4 AND rh % 16 = 0 THEN 1 ELSE 0 END AS brk
        |      FROM h),
        |ch AS (SELECT *, COALESCE(SUM(brk) OVER (PARTITION BY doc_id, ver ORDER BY p
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |       FROM b),
        |chunks AS (
        |  SELECT doc_id, ver, source,
        |         md5(string_agg(tok, ' ' ORDER BY p)) AS ck, COUNT(*) AS ctoks
        |  FROM ch GROUP BY doc_id, ver, source, chunk_id),
        |live_refs AS (
        |  SELECT * FROM chunks WHERE ver = 1
        |  UNION ALL
        |  SELECT * FROM chunks
        |  WHERE ver = 0 AND doc_id NOT IN (SELECT doc_id FROM ed)),
        |live_ck AS (SELECT DISTINCT ck FROM live_refs),
        |dead_ck AS (SELECT DISTINCT ck FROM chunks
        |            WHERE ck NOT IN (SELECT ck FROM live_ck)),
        |live_src AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS live_chunks,
        |         CAST(SUM(ctoks) AS BIGINT) AS live_toks
        |  FROM (SELECT DISTINCT source, ck, ctoks FROM live_refs) z
        |  GROUP BY source),
        |dead_src AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS reclaimed_chunks,
        |         CAST(SUM(ctoks) AS BIGINT) AS reclaimed_toks
        |  FROM (SELECT DISTINCT source, ck, ctoks FROM chunks
        |        WHERE ck IN (SELECT ck FROM dead_ck)) z
        |  GROUP BY source)
        |SELECT l.source, l.live_chunks, l.live_toks,
        |       COALESCE(d.reclaimed_chunks, 0) AS reclaimed_chunks,
        |       COALESCE(d.reclaimed_toks, 0) AS reclaimed_toks
        |FROM live_src l LEFT JOIN dead_src d USING (source)
        |ORDER BY source""".stripMargin
    ),

    // --------------------------------------------------------------- q252
    // MinHash-LSH band/row operating curve at a fixed 16-hash budget:
    // levels (bands × rows/band) = 2×8, 4×4, 8×2, 16×1 over ONE shared
    // 16-minhash table (the q248 rank-prefix-slice construction applied
    // to bands — hash i belongs to band i div r at the level with r
    // rows/band). Two deliberate departures from q83's machinery, both
    // forced by MEASURED degeneracy on this corpus (the q223 key-entropy
    // lesson, round 14 edition):
    //  1. basis = char-4-gram shingles (q65's), not word tokens — the
    //     31-word vocabulary makes word-token sets near-identical and the
    //     whole curve collapses to one flat row;
    //  2. hash family = LlmExt2.mhMults (69621-power multipliers), not
    //     the original (4i+3)·tid + 7i+5: with multipliers ≤ 67 and
    //     tid < P/67 the affine map NEVER WRAPS, so min((4i+3)·tid+…) =
    //     (4i+3)·min(tid)+… for EVERY i — all 16 "independent" minhashes
    //     pick the same argmin token and every band config produces
    //     identical candidates (measured: flat 545-candidate curve).
    //     Round 15's first replacement, 48271·(i+1) mod P, wrapped but
    //     kept all multipliers sharing the factor 48271 — correlated
    //     argmins, measured 296× candidate inflation at 320k real-regime
    //     docs (SCALE.md mhfamily) — so the final family is 16
    //     multiplicatively unrelated power residues, shared with the
    //     production `LlmExt2.minhashArr` (q46/q75/q78/q83 + streaming
    //     s9): the curve this query declares tunes the family the
    //     production join actually runs.
    // Band signatures chain the r minhashes with fixed literal
    // coefficients (131^j mod 1000003 — each term < 2^17·2^20, a sum of
    // ≤ 8 < 2^43, exact BIGINT in both engines; q83's 131-power chain
    // would overflow at r = 8). Ground truth = brute same-lang shingle
    // Jaccard ≥ 0.4 pairs. True r-tuple band matches NEST across levels
    // (a matching 8-row band is two matching 4-row bands: band j at
    // level b = bands 2j, 2j+1 at level 2b), so n_cand / n_hit / recall
    // are monotone non-decreasing in nbands and the spec locks the
    // s-curve shape (measured sf0.1 recall: .003/.08/.69/1.0). Scale
    // shape: the carve×carve truth join is the deliberate audit pass
    // (q83's posture, probe side repartitioned); per-level candidate
    // generation is a (nbands, band, sig, lang)-bucket self-join — at
    // 100 TB it is the q46 production join per level, and the curve is
    // what picks the level before the production run.
    "q252_lsh_band_curve" -> QDef(
      (s, d) => {
        import s.implicits._
        val levels = bandLevels.toDF("nbands", "rpb")
        val (exact, cand) = bandCurveParts(s, d)
        val nExact = exact.agg(count(lit(1)).as("n_exact"))
        // ONE pass counts candidates AND hits (r15 opt): exact pairs are
        // unique, so the left join never fans out and count(h) counts
        // exactly the semi-join's matches — one aggregation instead of
        // two + a join of the two rollups.
        val perLevel = cand
          .join(exact.withColumn("h", lit(1)), Seq("doc_a", "doc_b"), "left")
          .groupBy("nbands")
          .agg(count(lit(1)).as("n_cand"), count(col("h")).as("n_hit"))
        levels.join(perLevel, Seq("nbands"), "left")
          .crossJoin(nExact)
          .select(col("nbands").cast("long").as("nbands"),
            col("rpb").cast("long").as("rows_per_band"),
            col("n_exact"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("recall", col("n_hit") / col("n_exact"))
          .withColumn("cand_precision",
            when(col("n_cand") > 0, col("n_hit") / col("n_cand")).otherwise(lit(0.0)))
          .orderBy("nbands")
      },
      s"""WITH d AS (SELECT doc_id, lang, text FROM documents
        |           WHERE doc_id % 7 = 0 AND len(text) >= 4),
        |toks AS (SELECT DISTINCT doc_id, lang,
        |           substr(text, CAST(i AS INT), 4) AS tok
        |         FROM d, unnest(generate_series(1, len(text) - 3)) t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |          FROM toks a JOIN toks b
        |            ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |exact AS (SELECT doc_a, doc_b FROM inter
        |          JOIN sizes sa ON sa.doc_id = doc_a
        |          JOIN sizes sb ON sb.doc_id = doc_b
        |          WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.4),
        |dict AS (SELECT tok, dense_rank() OVER (ORDER BY tok) AS tid
        |         FROM (SELECT DISTINCT tok FROM toks) u),
        |tid AS (SELECT doc_id, lang, tid FROM toks JOIN dict USING (tok)),
        |mh AS (SELECT doc_id, lang, i,
        |         MIN((h.mult * tid + 7 * i + 5) % 104729) AS mh
        |       FROM tid CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i,
        |                    unnest([${LlmExt2.mhMultsSql}]) AS mult) h
        |       GROUP BY doc_id, lang, i),
        |coef AS (SELECT * FROM (VALUES (0, 1), (1, 131), (2, 17161), (3, 248085),
        |           (4, 499039), (5, 373914), (6, 982590), (7, 718906)) c(j, cf)),
        |lv AS (SELECT * FROM (VALUES (2, 8), (4, 4), (8, 2), (16, 1)) t(nbands, rpb)),
        |sig AS (SELECT doc_id, lang, nbands, CAST(i // rpb AS BIGINT) AS band,
        |          CAST(SUM(mh * cf) AS BIGINT) AS sig
        |        FROM mh CROSS JOIN lv JOIN coef ON coef.j = i % rpb
        |        GROUP BY doc_id, lang, nbands, i // rpb),
        |cand AS (SELECT DISTINCT x.nbands, x.doc_id AS doc_a, y.doc_id AS doc_b
        |         FROM sig x JOIN sig y ON x.nbands = y.nbands AND x.band = y.band
        |           AND x.sig = y.sig AND x.lang = y.lang AND x.doc_id < y.doc_id),
        |per AS (SELECT c.nbands,
        |          CAST(COUNT(*) AS BIGINT) AS n_cand,
        |          CAST(COUNT(e.doc_a) AS BIGINT) AS n_hit
        |        FROM cand c LEFT JOIN exact e
        |          ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
        |        GROUP BY c.nbands)
        |SELECT CAST(lv.nbands AS BIGINT) AS nbands,
        |       CAST(lv.rpb AS BIGINT) AS rows_per_band,
        |       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
        |       COALESCE(per.n_cand, 0) AS n_cand,
        |       COALESCE(per.n_hit, 0) AS n_hit,
        |       COALESCE(per.n_hit, 0) / CAST((SELECT COUNT(*) FROM exact) AS BIGINT)
        |         AS recall,
        |       CASE WHEN COALESCE(per.n_cand, 0) > 0
        |            THEN per.n_hit / per.n_cand ELSE 0.0 END AS cand_precision
        |FROM lv LEFT JOIN per ON per.nbands = lv.nbands
        |ORDER BY nbands""".stripMargin
    ),

    // --------------------------------------------------------------- q253
    // MinHash ESTIMATOR calibration — the statistical companion to q252's
    // operating curve: per true-Jaccard decile, how well does 16-hash
    // signature agreement (est = matches/16) estimate the real shingle
    // Jaccard? Reports n_pairs, avg_est, avg_true, and MAE per bucket —
    // the calibration table that justifies (or prices) reading signature
    // agreement as similarity at 100 TB, where true Jaccard is never
    // computed corpus-wide. ALL same-lang carve pairs are included
    // (zero-overlap pairs land in bucket 0 — excluding them would bias
    // the table's left edge). Determinism: est = k/16.0 is exact (k ≤ 16,
    // a power-of-two division); true Jaccard is the identical IEEE double
    // in both engines (ratio of small exact ints, never rounded); but
    // AVERAGES of arbitrary doubles are order-sensitive, so avg_true and
    // mae ride the documented quantize-first recipe (FLOOR(x·1e9) → exact
    // long sum ≤ 5e13 < 2^53 → two divisions — every step bit-identical
    // across engines; avg_est needs none of this: Σk is an integer).
    // Scale shape: the carve×carve pass is the deliberate audit posture
    // (q83/q252); the production estimator itself is a pure per-pair
    // projection of two 128-byte signatures.
    "q253_mh_estimator" -> QDef(
      (s, d) => {
        val docsT = shingleDocs(s, d)
        val m = docsT.join(shingleMinhash(docsT), Seq("doc_id", "lang"))
          .localCheckpoint() // both sides of the all-pairs join
        val pairs = m.repartition(32).as("a")
          .join(m.as("b"),
            col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
          .select(
            size(array_intersect(col("a.toks"), col("b.toks"))).cast("long").as("n_common"),
            col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
            expr("aggregate(zip_with(a.mh, b.mh, (x, y) -> IF(x = y, 1L, 0L)), 0L, (acc, v) -> acc + v)")
              .as("k"))
          .withColumn("jtrue",
            col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
          .withColumn("est", col("k") / lit(16.0))
        pairs
          .withColumn("bucket", least(floor(col("jtrue") * 10), lit(9L)).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_pairs"),
            sum("k").as("sum_k"),
            sum(floor(col("jtrue") * 1e9).cast("long")).as("sq_true"),
            sum(floor(abs(col("est") - col("jtrue")) * 1e9).cast("long")).as("sq_err"))
          .select(col("bucket"), col("n_pairs"),
            (col("sum_k").cast("double") / (col("n_pairs") * 16).cast("double")).as("avg_est"),
            (col("sq_true").cast("double") / col("n_pairs").cast("double") / lit(1e9)).as("avg_true"),
            (col("sq_err").cast("double") / col("n_pairs").cast("double") / lit(1e9)).as("mae"))
          .orderBy("bucket")
      },
      s"""WITH d AS (SELECT doc_id, lang, text FROM documents
        |           WHERE doc_id % 7 = 0 AND len(text) >= 4),
        |toks AS (SELECT DISTINCT doc_id, lang,
        |           substr(text, CAST(i AS INT), 4) AS tok
        |         FROM d, unnest(generate_series(1, len(text) - 3)) t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        |dict AS (SELECT tok, dense_rank() OVER (ORDER BY tok) AS tid
        |         FROM (SELECT DISTINCT tok FROM toks) u),
        |tid AS (SELECT doc_id, lang, tid FROM toks JOIN dict USING (tok)),
        |mh AS (SELECT doc_id, lang, i,
        |         MIN((h.mult * tid + 7 * i + 5) % 104729) AS mh
        |       FROM tid CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i,
        |                    unnest([${LlmExt2.mhMultsSql}]) AS mult) h
        |       GROUP BY doc_id, lang, i),
        |agree AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            COUNT(*) FILTER (WHERE a.mh = b.mh) AS k
        |          FROM mh a JOIN mh b
        |            ON a.i = b.i AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |          FROM toks a JOIN toks b
        |            ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (
        |  SELECT ag.k,
        |         COALESCE(i.n_common, 0) / (sa.sz + sb.sz - COALESCE(i.n_common, 0))
        |           AS jtrue,
        |         ag.k / 16.0 AS est
        |  FROM agree ag
        |  LEFT JOIN inter i ON i.doc_a = ag.doc_a AND i.doc_b = ag.doc_b
        |  JOIN sizes sa ON sa.doc_id = ag.doc_a
        |  JOIN sizes sb ON sb.doc_id = ag.doc_b),
        |bkt AS (SELECT LEAST(CAST(FLOOR(jtrue * 10) AS BIGINT), 9) AS bucket,
        |          k, jtrue, est FROM pairs)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE)
        |         / CAST(COUNT(*) * 16 AS DOUBLE) AS avg_est,
        |       CAST(CAST(SUM(CAST(FLOOR(jtrue * 1e9) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) / 1e9 AS avg_true,
        |       CAST(CAST(SUM(CAST(FLOOR(ABS(est - jtrue) * 1e9) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) / 1e9 AS mae
        |FROM bkt GROUP BY bucket ORDER BY bucket""".stripMargin
    )
  )
}

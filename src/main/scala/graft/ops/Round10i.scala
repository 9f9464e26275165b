package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 9: the remaining uncovered techniques — a salted JOIN
  * (q186, the join-side complement of q67's salted aggregation), a Welch
  * two-sample t-test on a continuous metric (q187, the continuous
  * complement of q146's two-proportion z), n-gram-overlap benchmark
  * decontamination (q188, the token-level complement of q73's exact and
  * q79's bloom-hash document matching), and the Spark 4 parameterized-SQL
  * surface `IDENTIFIER(:tbl)` + named parameter markers (q189).
  *
  * Determinism: doubles are aggregated ONLY through the CLAUDE.md
  * quantize bridge (FLOOR(x·10^k) → BIGINT — floor and the power-of-ten
  * multiply are identical IEEE ops in both engines, BIGINT sums are
  * exact and order-free), then divided back out in identically-spelled
  * double expressions; sqrt is IEEE-exact.
  */
object Round10i {
  import Tables._

  /** q188's candidate universe: docs with ≥ 8 tokens, tokens staged as a
    * plain attribute (the HOF staging rule). Shared with the s28 streaming
    * decontamination monitor so the twins are the same logic by
    * construction. */
  private[graft] def docToks(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 8)

  /** q188's 8-token n-gram extraction over [[docToks]]. */
  private[graft] def docGrams(docs: org.apache.spark.sql.DataFrame) =
    docToks(docs).select(col("doc_id"), col("lang"),
      explode(expr(
        "transform(sequence(1, size(tk) - 7), i -> array_join(slice(tk, i, 8), ' '))"))
        .as("gram"))

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q186
    // Salted equi-join: the fact side carries salt = xxhash64(event_id)
    // mod S, the dim side is replicated S ways, and the join key becomes
    // (event_type, salt) — S reducers per hot key instead of one. This is
    // the shuffle-join skew counter for when the dim is too large to
    // broadcast and AQE skew splitting is unavailable (pre-Spark-3 envs,
    // or deterministic-layout requirements); q67 is the aggregation twin.
    // The salt is invisible to the RESULT (the oracle is the plain join):
    // any per-(key,salt) partial regrouped by key alone reproduces the
    // unsalted answer, which is exactly what the final groupBy does.
    // S = 16 is a test-scale constant; at production scale S tracks the
    // observed per-key row share (SCALE.md §9 salting discipline).
    // events.value is DOUBLE → FLOOR(value·1e9) BIGINT bridge (value ≤
    // ~561, 100k rows ⇒ Σ ≤ 5.7e16, far inside int64).
    "q186_skew_join_salted" -> QDef(
      (s, d) => {
        val S = 16
        val dim = s.createDataFrame(Seq(
          ("click", 1.5), ("view", 0.2), ("purchase", 9.0),
          ("signup", 3.0), ("error", 0.0)
        )).toDF("event_type", "weight")
        val saltedDim = dim.withColumn("salt",
          explode(sequence(lit(0L), lit(S - 1L))))
        val fact = events(s, d).select(
          col("event_type"),
          pmod(xxhash64(col("event_id")), lit(S.toLong)).as("salt"),
          floor(col("value") * lit(1e9)).as("vq"))
        fact.join(saltedDim, Seq("event_type", "salt"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("vq").as("svq"),
            first("weight").as("w"))
          .select(col("event_type"), col("n_events"),
            (col("svq").cast("double") / lit(1e9) * col("w"))
              .as("weighted_value"))
          .orderBy("event_type")
      },
      """WITH dim(event_type, weight) AS (VALUES
        |  ('click', 1.5), ('view', 0.2), ('purchase', 9.0),
        |  ('signup', 3.0), ('error', 0.0))
        |SELECT e.event_type, COUNT(*) AS n_events,
        |       CAST(CAST(SUM(CAST(FLOOR(e.value * 1e9) AS BIGINT)) AS BIGINT)
        |            AS DOUBLE) / 1e9 * MIN(d.weight) AS weighted_value
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY 1 ORDER BY e.event_type""".stripMargin
    ),

    // --------------------------------------------------------------- q187
    // Welch's two-sample t-test: does mean order value differ between
    // open ('O') and fulfilled ('F') orders? Everything flows from three
    // exact per-group BIGINT aggregates (n, Σ⌊x·1e6⌋, Σ⌊x²·1e2⌋) — and
    // both groups come out of ONE global conditional aggregation (a
    // single map-side-combinable pass producing one row; no join of any
    // kind — a 1×1 self-cross of the group stats would plan a
    // nested-loop build the PlanAudit gate can't see a bound on, because
    // the optimizer folds away the bounding limit). Then an identically-
    // spelled double formula on both engines:
    // m = (Σxq/1e6)/n, v = (Σx2q/1e2 − n·m²)/(n−1),
    // t = (m1−m2)/√(v1/n1 + v2/n2), Welch–Satterthwaite df.
    // Bounds (o_totalprice < 5e5, ~50k rows/group at sf0.1): Σxq ≤
    // 2.5e16, Σx2q ≤ 1.25e18 — inside int64. The 1e2 quantum on x² is a
    // test-scale constant: at 100× the rows, drop it to 1 (or carve) to
    // stay inside int64 — the t-stat loses nothing observable either way.
    "q187_welch_ttest" -> QDef(
      (s, d) => {
        val g = orders(s, d)
          .where(col("o_orderstatus").isin("O", "F"))
          .select(col("o_orderstatus").as("grp"),
            floor(col("o_totalprice") * lit(1e6)).as("xq"),
            floor(col("o_totalprice") * col("o_totalprice") * lit(1e2))
              .as("x2q"))
          .agg(
            count(when(col("grp") === "O", lit(1))).as("na"),
            sum(when(col("grp") === "O", col("xq"))).as("sxa"),
            sum(when(col("grp") === "O", col("x2q"))).as("sx2a"),
            count(when(col("grp") === "F", lit(1))).as("nb"),
            sum(when(col("grp") === "F", col("xq"))).as("sxb"),
            sum(when(col("grp") === "F", col("x2q"))).as("sx2b"))
        val m = (st: String) =>
          col(s"sx$st").cast("double") / lit(1e6) / col(s"n$st")
        val v = (st: String) =>
          (col(s"sx2$st").cast("double") / lit(1e2) -
            col(s"n$st") * m(st) * m(st)) / (col(s"n$st") - lit(1))
        val se2 = (st: String) => v(st) / col(s"n$st")
        g.select(
          col("na").as("n_open"), col("nb").as("n_fulfilled"),
          m("a").as("mean_open"), m("b").as("mean_fulfilled"),
          ((m("a") - m("b")) / sqrt(se2("a") + se2("b"))).as("t_stat"),
          ((se2("a") + se2("b")) * (se2("a") + se2("b")) /
            (se2("a") * se2("a") / (col("na") - lit(1)) +
              se2("b") * se2("b") / (col("nb") - lit(1)))).as("df"))
      },
      """WITH g AS (
        |  SELECT COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS na,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |                       THEN CAST(FLOOR(o_totalprice * 1e6) AS BIGINT) END)
        |              AS BIGINT) AS sxa,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |                       THEN CAST(FLOOR(o_totalprice * o_totalprice * 1e2) AS BIGINT) END)
        |              AS BIGINT) AS sx2a,
        |         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS nb,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |                       THEN CAST(FLOOR(o_totalprice * 1e6) AS BIGINT) END)
        |              AS BIGINT) AS sxb,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |                       THEN CAST(FLOOR(o_totalprice * o_totalprice * 1e2) AS BIGINT) END)
        |              AS BIGINT) AS sx2b
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
        |s AS (
        |  SELECT na, nb,
        |         CAST(sxa AS DOUBLE) / 1e6 / na AS ma,
        |         CAST(sxb AS DOUBLE) / 1e6 / nb AS mb,
        |         (CAST(sx2a AS DOUBLE) / 1e2 -
        |          na * (CAST(sxa AS DOUBLE) / 1e6 / na) * (CAST(sxa AS DOUBLE) / 1e6 / na))
        |         / (na - 1) AS va,
        |         (CAST(sx2b AS DOUBLE) / 1e2 -
        |          nb * (CAST(sxb AS DOUBLE) / 1e6 / nb) * (CAST(sxb AS DOUBLE) / 1e6 / nb))
        |         / (nb - 1) AS vb
        |  FROM g)
        |SELECT na AS n_open, nb AS n_fulfilled, ma AS mean_open, mb AS mean_fulfilled,
        |       (ma - mb) / sqrt(va / na + vb / nb) AS t_stat,
        |       (va / na + vb / nb) * (va / na + vb / nb) /
        |       ((va / na) * (va / na) / (na - 1) +
        |        (vb / nb) * (vb / nb) / (nb - 1)) AS df
        |FROM s""".stripMargin
    ),

    // --------------------------------------------------------------- q188
    // N-gram benchmark decontamination: flag every candidate document
    // sharing at least one 8-token n-gram with the benchmark carve
    // (doc_id % 50 = 0) — the token-level contamination check training
    // pipelines run against eval sets, catching paraphrase-adjacent
    // overlap that q73's exact-text and q79's whole-doc-hash forms miss.
    // Scale shape: gram extraction is a map-side explode (Θ(tokens)); the
    // benchmark gram set is DISTINCT over the small carve (broadcastable
    // at any corpus scale — the benchmark is eval-set-sized by
    // definition); the probe is a semi-join on the gram key. The 8-gram
    // width and the %50 carve are test-scale constants (production uses
    // the real eval registry; 8–13 grams is the published range).
    // HOF discipline: tk is staged as a plain attribute before the
    // transform/slice chain references it (the q46/q75 staging rule).
    "q188_ngram_decontam" -> QDef(
      (s, d) => {
        val toks = docToks(documents(s, d))
        val grams = docGrams(documents(s, d))
        val bench = grams.where(col("doc_id") % 50 === 0)
          .select("gram").distinct()
        val hit = grams.where(col("doc_id") % 50 =!= 0)
          .join(bench, Seq("gram"), "left_semi")
          .select("doc_id").distinct()
        toks.where(col("doc_id") % 50 =!= 0)
          .join(hit.withColumn("contam", lit(1)), Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("contam").as("n_contaminated"))
          .select(col("lang"), col("n_docs"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            (coalesce(col("n_contaminated"), lit(0L)) / col("n_docs"))
              .as("contamination_rate"))
          .orderBy("lang")
      },
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |tt AS (SELECT * FROM toks WHERE len(tk) >= 8),
        |g AS (SELECT doc_id, lang, array_to_string(tk[i:i+7], ' ') AS gram
        |      FROM (SELECT doc_id, lang, tk,
        |                   unnest(generate_series(1, len(tk) - 7)) AS i
        |            FROM tt) sub),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT doc_id FROM g
        |        WHERE doc_id % 50 <> 0 AND gram IN (SELECT gram FROM bench))
        |SELECT tt.lang, COUNT(*) AS n_docs,
        |       CAST(COUNT(hit.doc_id) AS BIGINT) AS n_contaminated,
        |       CAST(COUNT(hit.doc_id) AS BIGINT) / COUNT(*) AS contamination_rate
        |FROM tt LEFT JOIN hit ON tt.doc_id = hit.doc_id
        |WHERE tt.doc_id % 50 <> 0
        |GROUP BY 1 ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q189
    // Spark 4 parameterized SQL: IDENTIFIER(:tbl) binds a table name from
    // a named parameter (injection-safe dynamic SQL — the identifier is
    // resolved as a name, never spliced as text), and :min_chars binds a
    // literal. The plan under it is an ordinary pushdown-friendly
    // aggregate; the surface is what's being exercised (the q177–q179
    // convention). The oracle replays the resolved query.
    "q189_identifier_param" -> QDef(
      (s, d) => {
        documents(s, d).createOrReplaceTempView("graft_q189_docs")
        s.sql(
          """SELECT lang, COUNT(*) AS n_docs,
            |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            |FROM IDENTIFIER(:tbl) WHERE n_chars >= :min_chars
            |GROUP BY lang ORDER BY lang""".stripMargin,
          Map("tbl" -> "graft_q189_docs", "min_chars" -> 200))
      },
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars >= 200
        |GROUP BY lang ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q190
    // Sparse TF-IDF cosine top-k: each document's 3 nearest neighbors
    // under cosine over TF-IDF term vectors, paired via the inverted-index
    // (term-key) join — the weighted-similarity complement of q101's
    // set-Jaccard prefix filter and the sparse complement of q41's dense
    // embeddings. IDF-zero terms (df = N — the corpus's universal tokens)
    // drop out of the vectors, which is stop-word pruning for free and
    // exactly the df-cap discipline the inverted-index join needs at
    // scale (a term's pair fan-out is df²; production prunes df > θ·N —
    // here the adversarial 31-token vocabulary makes EVERY term common,
    // so the 1-in-20 doc carve bounds the quadratic the q47/q48 way).
    // Determinism: weights are rounded transcendentals as DECIMAL(18,4)
    // (q70's recipe), so norms (Σw²) and dots (Σ wa·wb) are exact
    // decimals; the emitted cosine is one identically-spelled double
    // expression (sqrt IEEE-exact). Zero-norm docs are filtered on both
    // engines before any quotient.
    "q190_sparse_cosine_topk" -> QDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val carve = documents(s, d).where(col("doc_id") % 20 === 0)
        val tf = carve
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfs = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val nd = carve.agg(count(lit(1)).as("n")).limit(1)
        // r15 opt: the 4-decimal TF-IDF weights aggregate as SCALED LONGS
        // (w·1e4 — the decimal→int grid is exact: DECIMAL(18,4)·10⁴ is the
        // integral unscaled value), so the ~2M-row token self-join ships
        // 8-byte longs instead of 16-byte decimals (guide §2.3 narrower
        // types) and the dot/norm sums stay codegen'd long hash aggregates
        // instead of Decimal-object sums. Bounds: w ≤ ~1.1e3 ⇒ w4 ≤ 1.1e7,
        // a pair shares ≤ |vocab| toks ⇒ |dot4| ≤ ~4e15 < 2^53 — so the
        // long→double casts below are exact, /1e8 is one correctly-rounded
        // IEEE op, and the emitted cosine doubles are BIT-IDENTICAL to the
        // decimal form's (same rationale as the CLAUDE.md quantize-first
        // recipe; parity re-verified at both SFs).
        val w = tf.join(broadcast(dfs), "tok")
          .crossJoin(broadcast(nd))
          .withColumn("score", round(col("tf") * log(col("n") / col("df")), 4))
          .where(col("score") =!= 0)
          .select(col("doc_id"), col("tok"),
            (col("score").cast(DecimalType(18, 4)) * 10000).cast("long").as("w4"))
        val norms = w.groupBy("doc_id")
          .agg(sum(col("w4") * col("w4")).as("n2"))
          .where(col("n2") > 0)
        val dots = w.as("a")
          .join(w.as("b"),
            col("a.tok") === col("b.tok") && col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(sum(col("a.w4") * col("b.w4")).as("dot"))
        val cos = dots
          .join(norms.as("na"), col("da") === col("na.doc_id"))
          .join(norms.as("nb"), col("db") === col("nb.doc_id"))
          .select(col("da"), col("db"),
            ((col("dot").cast("double") / 1e8) /
              (sqrt(col("na.n2").cast("double") / 1e8) *
                sqrt(col("nb.n2").cast("double") / 1e8))).as("cosine"))
        cos
          .withColumn("rk", row_number().over(
            Window.partitionBy("da").orderBy(col("cosine").desc, col("db"))))
          .where(col("rk") <= 3)
          .select(col("da").as("doc_id"), col("rk"),
            col("db").as("neighbor_id"), col("cosine"))
          .orderBy("doc_id", "rk")
      },
      """WITH carve AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM carve),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfs AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n FROM carve),
        |w AS (SELECT doc_id, tf.tok,
        |        CAST(round(tf * ln(n / df), 4) AS DECIMAL(18,4)) AS w
        |      FROM tf JOIN dfs ON tf.tok = dfs.tok CROSS JOIN nd
        |      WHERE round(tf * ln(n / df), 4) <> 0),
        |norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM w
        |          GROUP BY 1 HAVING SUM(w * w) > 0),
        |dots AS (SELECT a.doc_id AS da, b.doc_id AS db, SUM(a.w * b.w) AS dot
        |         FROM w a JOIN w b
        |           ON a.tok = b.tok AND a.doc_id <> b.doc_id
        |         GROUP BY 1, 2),
        |cos AS (SELECT da, db,
        |          CAST(dot AS DOUBLE) /
        |          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        |        FROM dots JOIN norms na ON da = na.doc_id
        |                  JOIN norms nb ON db = nb.doc_id),
        |rk AS (SELECT da, db, cosine,
        |         CAST(row_number() OVER (PARTITION BY da
        |              ORDER BY cosine DESC, db) AS INTEGER) AS rk
        |       FROM cos)
        |SELECT da AS doc_id, rk, db AS neighbor_id, cosine
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
    )
  )
}

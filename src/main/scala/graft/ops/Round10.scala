package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 additions: the text-analysis/curation statistics a training-
  * data pipeline runs between dedup and packing — per-doc information
  * content (q155), a conditional LM score (q156), and the per-source
  * duplication/novelty audits (q157/q158) plus trigram diversity (q159).
  *
  * House determinism discipline throughout: exact integer counts; every
  * transcendental (ln) rounded per-row to 4 decimals THEN cast to
  * DECIMAL(18,4) so cross-row sums are exact and order-free (the
  * q70/q134 recipe); every emitted division a raw IEEE quotient of
  * identically-derived operands; total output orders.
  */
object Round10 {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q155
    // Per-language token-entropy profile: Shannon entropy of each doc's
    // token distribution (H = Σ p·ln(1/p) over token TYPES, p = k/len),
    // rolled up per language — the "information density" quality signal
    // (boilerplate and template spam sit at the low tail). Per-type terms
    // are rounded transcendentals as exact decimals, so the per-doc sum
    // and the per-lang min/max/avg are order-free. Scale: one explode +
    // three keyed aggregations, all map-side-combinable; no window, no
    // join wider than (doc × types).
    "q155_token_entropy" -> QDef(
      (s, d) => {
        val tf = documents(s, d)
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("k"))
        val lens = tf.groupBy("doc_id", "lang").agg(sum("k").as("len"))
        val ent = tf.join(lens, Seq("doc_id", "lang"))
          .select(col("doc_id"), col("lang"),
            round((col("k") / col("len")) * log(col("len") / col("k")), 4)
              .cast(Det.D).as("term"))
          .groupBy("doc_id", "lang").agg(sum("term").as("h"))
        ent.groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            (sum("h").cast("double") / count(lit(1))).as("avg_entropy"),
            min("h").cast("double").as("min_entropy"),
            max("h").cast("double").as("max_entropy"))
          .orderBy("lang")
      },
      """WITH tf AS (SELECT doc_id, lang, tok, COUNT(*) AS k FROM
        |  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  GROUP BY 1, 2, 3),
        |lens AS (SELECT doc_id, SUM(k) AS len FROM tf GROUP BY 1),
        |ent AS (SELECT tf.doc_id, tf.lang,
        |          SUM(CAST(ROUND((k / len) * ln(len / k), 4) AS DECIMAL(18,4))) AS h
        |        FROM tf JOIN lens ON tf.doc_id = lens.doc_id GROUP BY 1, 2)
        |SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(h) AS DOUBLE) / COUNT(*) AS avg_entropy,
        |       CAST(MIN(h) AS DOUBLE) AS min_entropy,
        |       CAST(MAX(h) AS DOUBLE) AS max_entropy
        |FROM ent GROUP BY 1 ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q156
    // Bigram-LM negative log-likelihood per language — the conditional
    // companion of q134's unigram filter: p(t2|t1) = (c12+1)/(c1+V)
    // (add-one smoothing over the global vocabulary). The bigram extract
    // is ONE co-partitioned self-join of the position-exploded token
    // table on (doc_id, pos+1) — a single data-sized shuffle keyed by
    // doc_id; the LM table is (lang × V²-observed) rows, vocab-scale.
    // Per-bigram -ln(p) is a rounded transcendental as exact decimal;
    // the per-lang occurrence-weighted sum is exact.
    "q156_bigram_nll" -> QDef(
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")))
          .withColumnsRenamed(Map("pos" -> "pos", "col" -> "tok"))
        val bg = t.as("a")
          .join(t.as("b"),
            col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
          .select(col("a.lang").as("lang"), col("a.tok").as("t1"), col("b.tok").as("t2"))
        val c2 = bg.groupBy("lang", "t1", "t2").agg(count(lit(1)).as("c12"))
        val c1 = c2.groupBy("lang", "t1").agg(sum("c12").as("c1"))
        val vocab = t.agg(countDistinct("tok").as("v"))
        val nll = c2.join(c1, Seq("lang", "t1")).crossJoin(broadcast(vocab))
          .select(col("lang"), col("c12"),
            round(negate(log((col("c12") + 1).cast("double") /
              (col("c1") + col("v")).cast("double"))), 4)
              .cast(Det.D).as("bg_nll"))
        nll.groupBy("lang")
          .agg(
            sum("c12").as("n_bigrams"),
            round(sum(col("c12") * col("bg_nll")), 4).cast("double").as("sum_nll"))
          .withColumn("avg_nll", col("sum_nll") / col("n_bigrams"))
          .orderBy("lang")
      },
      """WITH t AS (SELECT doc_id, lang,
        |             unnest(string_split(text, ' ')) AS tok,
        |             generate_subscripts(string_split(text, ' '), 1) AS pos
        |           FROM documents),
        |bg AS (SELECT a.lang, a.tok AS t1, b.tok AS t2
        |       FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |c2 AS (SELECT lang, t1, t2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
        |c1 AS (SELECT lang, t1, SUM(c12) AS c1 FROM c2 GROUP BY 1, 2),
        |vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM t),
        |nll AS (SELECT c2.lang, c2.c12,
        |          CAST(ROUND(-ln(CAST(c12 + 1 AS DOUBLE) /
        |                          CAST(c1.c1 + vocab.v AS DOUBLE)), 4)
        |               AS DECIMAL(18,4)) AS bg_nll
        |        FROM c2 JOIN c1 ON c2.lang = c1.lang AND c2.t1 = c1.t1
        |        CROSS JOIN vocab)
        |SELECT lang, CAST(SUM(c12) AS BIGINT) AS n_bigrams,
        |       CAST(ROUND(SUM(c12 * bg_nll), 4) AS DOUBLE) AS sum_nll,
        |       CAST(ROUND(SUM(c12 * bg_nll), 4) AS DOUBLE) / SUM(c12) AS avg_nll
        |FROM nll GROUP BY 1 ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q157
    // Per-source duplicate-inflation audit: how many raw docs each source
    // contributes vs how many DISTINCT texts — the "which crawler is
    // re-serving the same pages" report that decides where dedup spend
    // goes. Exact counts, raw-quotient inflation. Scale: one keyed
    // aggregate; COUNT(DISTINCT text) shuffles (source, text) — at 100 TB
    // swap the text key for its xxhash64 (same cardinality, 8-byte keys).
    "q157_dup_inflation" -> QDef(
      (s, d) =>
        documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), countDistinct(col("text")).as("n_uniq"))
          .withColumn("dup_docs", col("n_docs") - col("n_uniq"))
          .withColumn("inflation", col("n_docs") / col("n_uniq"))
          .orderBy("source"),
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_uniq,
        |       COUNT(*) - COUNT(DISTINCT text) AS dup_docs,
        |       COUNT(*) / COUNT(DISTINCT text) AS inflation
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin
    ),

    // --------------------------------------------------------------- q158
    // Per-source novelty rate: the share of a source's docs that are the
    // FIRST occurrence of their text corpus-wide (by doc_id order) — the
    // complement of q157: q157 counts self-duplication, this catches a
    // source that mostly re-serves content ANOTHER source produced first.
    // The first-occurrence flag is one keyed window (partitioned by text
    // — never global), then a keyed rollup.
    "q158_novelty_rate" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("text")
        documents(s, d)
          .withColumn("first_id", min("doc_id").over(w))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("doc_id") === col("first_id"), 1)).as("novel_docs"))
          .withColumn("novelty_rate", col("novel_docs") / col("n_docs"))
          .orderBy("source")
      },
      """SELECT source, COUNT(*) AS n_docs,
        |       COUNT(CASE WHEN doc_id = first_id THEN 1 END) AS novel_docs,
        |       COUNT(CASE WHEN doc_id = first_id THEN 1 END) / COUNT(*) AS novelty_rate
        |FROM (SELECT source, doc_id, MIN(doc_id) OVER (PARTITION BY text) AS first_id
        |      FROM documents) t
        |GROUP BY 1 ORDER BY source""".stripMargin
    ),

    // --------------------------------------------------------------- q159
    // Token-trigram diversity per language: occurrence count, distinct
    // trigram count, and the top trigram's share of mass — the n-gram
    // repetitiveness profile (a template-heavy corpus shows a fat top
    // share; the doc-level analog is q80's repetition filter, the
    // event-sequence analog q141). Extraction is the q156 position join
    // taken one step further (pos+1, pos+2) — still keyed by doc_id, one
    // shuffle family; the rollup is map-side-combinable.
    "q159_trigram_coverage" -> QDef(
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")))
          .withColumnsRenamed(Map("pos" -> "pos", "col" -> "tok"))
        val tri = t.as("a")
          .join(t.as("b"),
            col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
          .join(t.as("c"),
            col("a.doc_id") === col("c.doc_id") && col("c.pos") === col("a.pos") + 2)
          .select(col("a.lang").as("lang"),
            col("a.tok").as("t1"), col("b.tok").as("t2"), col("c.tok").as("t3"))
        tri.groupBy("lang", "t1", "t2", "t3").agg(count(lit(1)).as("cnt"))
          .groupBy("lang")
          .agg(
            sum("cnt").as("n_occ"),
            count(lit(1)).as("n_distinct"),
            max("cnt").as("top_cnt"))
          .withColumn("top_share", col("top_cnt") / col("n_occ"))
          .orderBy("lang")
      },
      """WITH t AS (SELECT doc_id, lang,
        |             unnest(string_split(text, ' ')) AS tok,
        |             generate_subscripts(string_split(text, ' '), 1) AS pos
        |           FROM documents),
        |tri AS (SELECT a.lang, a.tok AS t1, b.tok AS t2, c.tok AS t3
        |        FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |                 JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
        |cnt AS (SELECT lang, t1, t2, t3, COUNT(*) AS cnt FROM tri GROUP BY 1, 2, 3, 4)
        |SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_occ, COUNT(*) AS n_distinct,
        |       MAX(cnt) AS top_cnt, MAX(cnt) / SUM(cnt) AS top_share
        |FROM cnt GROUP BY 1 ORDER BY lang""".stripMargin
    )
  )
}

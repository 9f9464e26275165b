package graft.ops

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 16: sequence-model scoring — a bigram conditional-LM
  * perplexity filter (q209, the order-sensitive upgrade of q134's
  * unigram NLL) and the stationary distribution of the q96 event
  * transition matrix by exact-integer power iteration (q210 — "where
  * does user behavior settle", the PageRank of the behavioral graph).
  *
  * Determinism: q209 reuses the q134 transcendental discipline — the
  * per-bigram −ln(p) is rounded once to DECIMAL(18,4), every downstream
  * sum is exact decimal. q210 never touches a double: the row-stochastic
  * matrix is quantized to ppm integers and each power-iteration step is
  * Σ v·P DIV 1e6 in int64 — bit-identical in any engine at any scale.
  */
object Round10p {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q209
    // Bigram-LM NLL per document: score every token against its
    // PREDECESSOR's add-one-smoothed conditional distribution,
    // p(tok|prev, lang) = (cnt(prev,tok)+1)/(cnt(prev,·)+V). Catches the
    // repetitive/boilerplate docs a unigram model (q134) cannot — word
    // salad with a natural unigram mix still has improbable transitions.
    // Scale shape: bigram extraction is MAP-SIDE (two staged slice
    // projections + one explode — no self-join on position); the LM is
    // langs·V² rows max (here ≤ 31², broadcast at any corpus size; a
    // real vocab's bigram table is pruned/top-K the same way q134's
    // unigram table is); the only data-sized shuffle is the per-doc
    // rollup, map-side-combinable. Docs with <2 tokens have no bigrams
    // and drop out (inner-join semantics, identical in both engines).
    "q209_bigram_nll" -> QDef(
      (s, d) => {
        val docBg = documents(s, d)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("a"))
          .where(size(col("a")) >= 2)
          .select(col("doc_id"), col("lang"),
            expr("slice(a, 1, size(a) - 1)").as("pa"),
            expr("slice(a, 2, size(a) - 1)").as("ta"))
          .select(col("doc_id"), col("lang"),
            explode(arrays_zip(col("pa"), col("ta"))).as("bg"))
          .select(col("doc_id"), col("lang"),
            col("bg.pa").as("prev"), col("bg.ta").as("tok"))
          .groupBy("doc_id", "lang", "prev", "tok")
          .agg(count(lit(1)).as("k"))
        val stats = docBg.groupBy("lang", "prev", "tok")
          .agg(sum("k").as("cnt"))
        val ctx = stats.groupBy("lang", "prev").agg(sum("cnt").as("ctx"))
        val vocab = stats.agg(countDistinct("tok").as("v"))
        val nll = stats.join(broadcast(ctx), Seq("lang", "prev"))
          .crossJoin(broadcast(vocab))
          .select(col("lang"), col("prev"), col("tok"),
            round(negate(log((col("cnt") + 1).cast("double") /
              (col("ctx") + col("v")).cast("double"))), 4)
              .cast(Det.D).as("tok_nll"))
        docBg.join(broadcast(nll), Seq("lang", "prev", "tok"))
          .groupBy("doc_id", "lang")
          .agg(
            sum("k").as("n_bigrams"),
            round(sum(col("k") * col("tok_nll")), 4).cast("double")
              .as("sum_nll"))
          .withColumn("avg_nll", col("sum_nll") / col("n_bigrams"))
          .orderBy("doc_id")
      },
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, l[i - 1] AS prev, l[i] AS tok
        |  FROM (SELECT doc_id, lang, l,
        |               unnest(generate_series(2, len(l))) AS i
        |        FROM toks) x),
        |docBg AS (
        |  SELECT doc_id, lang, prev, tok, COUNT(*) AS k
        |  FROM bg GROUP BY 1, 2, 3, 4),
        |stats AS (
        |  SELECT lang, prev, tok, CAST(SUM(k) AS BIGINT) AS cnt
        |  FROM docBg GROUP BY 1, 2, 3),
        |ctx AS (
        |  SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx
        |  FROM stats GROUP BY 1, 2),
        |vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM stats),
        |nll AS (
        |  SELECT s.lang, s.prev, s.tok,
        |         CAST(ROUND(-ln(CAST(s.cnt + 1 AS DOUBLE) /
        |                         CAST(c.ctx + vocab.v AS DOUBLE)), 4)
        |              AS DECIMAL(18,4)) AS tok_nll
        |  FROM stats s JOIN ctx c ON s.lang = c.lang AND s.prev = c.prev
        |  CROSS JOIN vocab)
        |SELECT d.doc_id, d.lang, CAST(SUM(d.k) AS BIGINT) AS n_bigrams,
        |       CAST(ROUND(SUM(d.k * n.tok_nll), 4) AS DOUBLE) AS sum_nll,
        |       CAST(ROUND(SUM(d.k * n.tok_nll), 4) AS DOUBLE)
        |         / CAST(SUM(d.k) AS BIGINT) AS avg_nll
        |FROM docBg d
        |JOIN nll n ON d.lang = n.lang AND d.prev = n.prev AND d.tok = n.tok
        |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin
    ),

    // --------------------------------------------------------------- q210
    // Stationary distribution of the event-type transition matrix: where
    // does user behavior concentrate if the observed per-user transition
    // dynamics run forward? Three UNROLLED power-iteration steps from the
    // uniform vector over the q96 matrix — enough to rank states by
    // long-run mass on a well-mixed chain, with the iteration count a
    // fixed contract (no driver loop, no convergence probe). EVERYTHING
    // is exact int64: the row-stochastic matrix quantizes to ppm
    // (P_ppm = 1e6·n DIV row_total), each step is
    // v'[j] = Σ_i v[i]·P_ppm[i][j] DIV 1e6 (terms ≤ 1e12, sums ≪ 2^63),
    // so both engines replay the identical trajectory — the mass lost to
    // integer floors (≤ S ppm per step) is part of the contract. Scale
    // shape: the transition extraction is q96's one user_id-partitioned
    // window; the matrix is |types|² rows (broadcast at any event
    // volume); each step is a broadcast join + an S-row rollup.
    "q210_markov_stationary" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pm = events(s, d)
          .withColumn("to_type", lead("event_type", 1).over(w))
          .where(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("row_tot",
            sum("n").over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"),
            expr("CAST(1000000 * n DIV row_tot AS BIGINT)").as("p_ppm"))
          .localCheckpoint()
        val nStates = pm.select(col("from_type").as("state")).distinct()
          .agg(count(lit(1)).as("ns"))
        val v0 = pm.select(col("from_type").as("state")).distinct()
          .crossJoin(broadcast(nStates))
          .select(col("state"),
            expr("CAST(1000000 DIV ns AS BIGINT)").as("v_ppm"))
        def step(v: DataFrame): DataFrame =
          v.join(broadcast(pm), col("state") === col("from_type"))
            .groupBy(col("to_type"))
            .agg(expr("CAST(sum(v_ppm * p_ppm) DIV 1000000 AS BIGINT)")
              .as("v_ppm"))
            .select(col("to_type").as("state"), col("v_ppm"))
        step(step(step(v0)))
          .select(col("state"), col("v_ppm").as("v3_ppm"))
          .orderBy("state")
      },
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |agg AS (
        |  SELECT from_type, to_type, COUNT(*) AS n FROM tr
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |pm AS (
        |  SELECT from_type, to_type,
        |         CAST(1000000 * n // SUM(n) OVER (PARTITION BY from_type)
        |           AS BIGINT) AS p_ppm
        |  FROM agg),
        |ns AS (SELECT COUNT(DISTINCT from_type) AS ns FROM pm),
        |v0 AS (
        |  SELECT DISTINCT from_type AS state,
        |         CAST(1000000 // ns AS BIGINT) AS v_ppm
        |  FROM pm CROSS JOIN ns),
        |v1 AS (
        |  SELECT to_type AS state,
        |         CAST(SUM(v_ppm * p_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v0 JOIN pm ON v0.state = pm.from_type GROUP BY 1),
        |v2 AS (
        |  SELECT to_type AS state,
        |         CAST(SUM(v_ppm * p_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v1 JOIN pm ON v1.state = pm.from_type GROUP BY 1),
        |v3 AS (
        |  SELECT to_type AS state,
        |         CAST(SUM(v_ppm * p_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v2 JOIN pm ON v2.state = pm.from_type GROUP BY 1)
        |SELECT state, v_ppm AS v3_ppm FROM v3 ORDER BY state""".stripMargin
    )
  )
}

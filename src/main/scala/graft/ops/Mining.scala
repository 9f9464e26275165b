package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 mining operators: blocked fuzzy record linkage, an
  * impact-ordered (champion-list) inverted index, and basket
  * co-occurrence with lift — the entity-resolution / retrieval /
  * association surfaces a curation stack needs beyond the hash- and
  * signature-based dedup family (q39–q52, q65, q75).
  *
  * Determinism contract (CLAUDE.md): edit distances and counts are exact
  * int64 on both engines; champion lists are totally ordered by
  * (tf DESC, doc_id); support/lift are raw IEEE quotients of exact int64
  * products, never rounded.
  */
object Mining {
  import Tables._

  /** PPJoin+-style exact set-similarity pairs at token-Jaccard ≥ 0.9.
    * Candidate generation is an equi-join on rarest-first (df ASC, tok)
    * prefix tokens, pruned by the PPJoin+ LENGTH filter (J ≥ 0.9 forces
    * 9·|b| ≤ 10·|a| both ways) and POSITIONAL filter (any common token at
    * sorted positions (i, j) bounds the overlap by
    * min(i,j) + 1 + min(|a|−i−1, |b|−j−1), which must reach the required
    * ceil(9(|a|+|b|)/19)) — all pure int64 arithmetic, so pruning can
    * never flake, and both bounds are unconditional identities of
    * qualifying pairs, so recall stays exactly 1 (the prefix-filter lemma
    * guarantees a shared indexed token; InvariantSpec re-proves equality
    * to an in-memory brute force). Exact array_intersect verify makes the
    * output identical to brute force. Shared by q101 (1/10 bench carve)
    * and ScaleCurve's uncarved scaling regimes: on the fixed-vocabulary
    * regime where per-token df grows linearly, the length+positional
    * pruning is the documented lever against the Θ(n²/V) candidate blowup
    * (SCALE.md §11 finding 2).
    * Output columns: doc_a, doc_b, sz_a, sz_b, n_common, jaccard. */
  private[graft] def ppjoinPairs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val tok = base.select(col("doc_id"), explode(col("toks")).as("tok"))
    val dfTab = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-doc tokens re-assembled in (df, tok) order; struct sort gives
    // the global total order without a single-partition rank window
    val sorted = tok.join(broadcast(dfTab), "tok")
      .groupBy("doc_id")
      .agg(
        transform(array_sort(collect_list(struct(col("df"), col("tok")))),
          x => x("tok")).as("toks"),
        count(lit(1)).as("sz"))
      .withColumn("pref",
        slice(col("toks"), lit(1), expr("sz - (9 * sz + 9) DIV 10 + 1")))
      .localCheckpoint() // feeds the index twice + both verify sides
    val idx = sorted.select(col("doc_id"), col("sz"),
      posexplode(col("pref")).as(Seq("pos", "ptok")))
    // 32-way spread of the probe side (q97 lesson: byte-small ckpt +
    // broadcast build = one task for the whole candidate expansion)
    val cand = idx.repartition(32).as("a")
      .join(idx.as("b"),
        col("a.ptok") === col("b.ptok") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * 10 >= col("b.sz") * 9 &&
          col("b.sz") * 10 >= col("a.sz") * 9 &&
          least(col("a.pos"), col("b.pos")) + lit(1) +
            least(col("a.sz") - col("a.pos") - 1,
              col("b.sz") - col("b.pos") - 1) >=
            expr("(9 * (a.sz + b.sz) + 18) DIV 19"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sorted.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
        col("sz").as("sz_a")), "doc_a")
      .join(sorted.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
        col("sz").as("sz_b")), "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b", "sz_a", "sz_b", "n_common", "jaccard")
  }

  val defs: Vector[(String, QDef)] = Vector(

    // ---------------------------------------------------------------- q97
    // Blocked fuzzy record linkage: customer pairs in the same
    // (nation, mktsegment) block whose names are within Levenshtein
    // distance 2 — the entity-resolution primitive (near-identical IDs,
    // typo'd names) that exact dedup (q39) and signature dedup (q46/q47)
    // can't express. The blocking key turns the quadratic all-pairs scan
    // into an equi-join whose per-block cost is bounded by block size —
    // the same never-all-pairs discipline as minhashLshPairs; at 100 TB
    // you'd block finer (name prefix + length band) with identical plan
    // shape. levenshtein() is codegen'd in Spark and exact-integer in
    // both engines, so the distance threshold can never flake.
    "q97_fuzzy_linkage" -> QDef(
      (s, d) => {
        val c = customer(s, d)
        val a = c.select(col("c_custkey").as("ck_a"), col("c_name").as("name_a"),
          col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
        val b = c.select(col("c_custkey").as("ck_b"), col("c_name").as("name_b"),
          col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
        // threshold form: banded O(threshold·|s|) DP that bails out early,
        // returning -1 past the bound — ~3× cheaper than the full matrix
        // at bench scale for the same exact distances (the oracle runs the
        // unbounded form; every kept distance is identical).
        // Explicit 32-way spread of the probe side: customer is one small
        // parquet split and the build side broadcasts, so without it the
        // ~893k levenshtein evaluations all run in ONE task (row-heavy,
        // byte-light — the shape AQE sizes by bytes and cannot fix).
        a.repartition(32).join(b, Seq("nk", "seg"))
          .where(col("ck_a") < col("ck_b"))
          .withColumn("dist",
            levenshtein(col("name_a"), col("name_b"), 3).cast("long"))
          .where(col("dist").between(0, 2))
          .select("ck_a", "ck_b", "dist")
          .orderBy("ck_a", "ck_b")
      },
      """SELECT a.c_custkey AS ck_a, b.c_custkey AS ck_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |  AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY ck_a, ck_b""".stripMargin
    ),

    // ---------------------------------------------------------------- q98
    // Impact-ordered inverted index: per term, document frequency, total
    // term frequency, and the top-10 champion list (doc_ids ordered by
    // tf DESC, doc_id) — the precomputed posting-list head a retrieval
    // scorer reads instead of the full postings. The full list per term
    // is |docs_with_term|-sized (unbounded per-group state at scale), so
    // the plan NEVER collects it: (term, doc) tf via hash aggregate
    // (map-side combined), then one term-partitioned sort feeding the
    // window aggregates and the row_number cut, and only the surviving
    // <= 10 rows per term reach collect_list (bounded agg buffer). The
    // 31-term corpus makes each term a fat partition here; a real vocab
    // distributes the same plan across millions of slim ones.
    "q98_inverted_index" -> QDef(
      (s, d) => {
        val tok = documents(s, d).select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        val td = tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        val w = Window.partitionBy("term")
        val wOrd = w.orderBy(col("tf").desc, col("doc_id"))
        td.withColumn("df", count(lit(1)).over(w))
          .withColumn("total_tf", sum("tf").over(w))
          .withColumn("rn", row_number().over(wOrd))
          .where(col("rn") <= 10)
          .groupBy("term")
          .agg(max("df").as("df"), max("total_tf").as("total_tf"),
            // comma-joined string, not ARRAY: the driver's pandas
            // comparator cannot hash array cells (round-7 driver-red).
            array_join(
              transform(array_sort(collect_list(struct(col("rn"), col("doc_id")))),
                x => x("doc_id").cast("string")), ",").as("champions"))
          .orderBy("term")
      },
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |td AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
        |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
        |       array_to_string((list(doc_id ORDER BY tf DESC, doc_id))[1:10],
        |                       ',') AS champions
        |FROM td GROUP BY term ORDER BY term""".stripMargin
    ),

    // ---------------------------------------------------------------- q99
    // Basket co-occurrence with lift: event-type pairs co-occurring in
    // the same (user, day) basket, with support and lift — the
    // association-rule table behind "users who X also Y" and feature
    // cross-correlation screens. The basket table is materialized ONCE
    // (distinct on (user, day, type) — one shuffle) and feeds all four
    // consumers; pair enumeration is a basket-key equi-join whose blowup
    // is bounded by |types|² per basket (5 types here), the singles and
    // basket-count sides are |types|- and 1-row broadcasts. Lift is
    // computed as a single IEEE division of two exact int64 products
    // ((n_ab·N) / (n_a·n_b)) — identical operation order in both engines.
    "q99_cooccur_lift" -> QDef(
      (s, d) => {
        val b = events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
          .distinct()
          .localCheckpoint() // one shuffle feeds pairs(×2), singles, N
        val nb = b.select("user_id", "d").distinct()
          .agg(count(lit(1)).as("n_baskets"))
        val singles = b.groupBy("event_type").agg(count(lit(1)).as("n"))
        val pairs = b.toDF("user_id", "d", "ta")
          .join(b.toDF("user_id", "d", "tb"), Seq("user_id", "d"))
          .where(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(singles.select(col("event_type").as("ta"), col("n").as("n_a"))), "ta")
          .join(broadcast(singles.select(col("event_type").as("tb"), col("n").as("n_b"))), "tb")
          .crossJoin(broadcast(nb))
          .select(col("ta"), col("tb"), col("n_ab"), col("n_a"), col("n_b"),
            (col("n_ab").cast("double") / col("n_baskets").cast("double"))
              .as("support"),
            ((col("n_ab") * col("n_baskets")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy("ta", "tb")
      },
      """WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
        |           FROM events),
        |nb AS (SELECT COUNT(*) AS n_baskets
        |       FROM (SELECT DISTINCT user_id, d FROM b)),
        |s AS (SELECT event_type, COUNT(*) AS n FROM b GROUP BY 1),
        |p AS (SELECT a.event_type AS ta, c.event_type AS tb, COUNT(*) AS n_ab
        |      FROM b a JOIN b c ON a.user_id = c.user_id AND a.d = c.d
        |        AND a.event_type < c.event_type
        |      GROUP BY 1, 2)
        |SELECT ta, tb, n_ab, sa.n AS n_a, sb.n AS n_b,
        |  CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
        |  CAST(n_ab * n_baskets AS DOUBLE) / CAST(sa.n * sb.n AS DOUBLE) AS lift
        |FROM p CROSS JOIN nb
        |JOIN s sa ON p.ta = sa.event_type
        |JOIN s sb ON p.tb = sb.event_type
        |ORDER BY ta, tb""".stripMargin
    ),

    // --------------------------------------------------------------- q101
    // Prefix-filtered set-similarity join (PPJoin+): exact token
    // Jaccard >= 0.9 pairs found WITHOUT all-pairs — see [[ppjoinPairs]]
    // for the prefix/length/positional filter stack (all int64-exact,
    // recall exactly 1; oracle = all-pairs, and InvariantSpec re-proves
    // equality against an in-memory brute force at sf0.001). This is the
    // EXACT complement of the probabilistic LSH family (q46/q52): same
    // never-all-pairs plan shape, zero recall loss. The 31-token dense
    // corpus is this technique's worst case (CLAUDE.md): buckets are
    // vocabulary-bounded here, while a real Zipfian vocab makes prefixes
    // rare tokens and buckets tiny — the 1/10 carve keeps the bench-scale
    // candidate set small, same discipline as q40's sampled oracle twin.
    "q101_prefix_filter_join" -> QDef(
      (s, d) =>
        ppjoinPairs(documents(s, d).where(col("doc_id") % 10 === 0))
          .orderBy("doc_a", "doc_b"),
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d) t),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS nc
        |          FROM toks a JOIN toks b
        |            ON a.tok = b.tok AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b, sa.sz AS sz_a, sb.sz AS sz_b,
        |       CAST(nc AS BIGINT) AS n_common,
        |       nc / (sa.sz + sb.sz - nc) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = da
        |           JOIN sizes sb ON sb.doc_id = db
        |WHERE nc / (sa.sz + sb.sz - nc) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin
    )
  )
}

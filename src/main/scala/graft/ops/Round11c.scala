package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-11 batch 3: two missing operator families.
  *
  *  - q223 edit-distance join with pigeonhole blocking: the entity-
  *    resolution primitive q97's token-Jaccard linkage cannot express
  *    (character-level typos). Candidates come from a 3-segment
  *    pigeonhole (≤2 substitutions touch ≤2 of 3 segments ⇒ one segment
  *    matches exactly), verified by the codegen'd `levenshtein`. The
  *    ORACLE is deliberately the brute-force O(carve²) form — an
  *    INDEPENDENT completeness check of the blocking: if the pigeonhole
  *    ever missed a pair the hash would split.
  *  - q224 deterministic negative sampling: contrastive-training triplet
  *    generation — (anchor, positive) from the exact-dup clusters, k=3
  *    negatives per positive drawn by portable hash arithmetic. Sampling
  *    by hash (not rand()) is what makes training data reproducible
  *    under retries/repartitioning — the q69/q139 discipline applied to
  *    pair mining.
  */
object Round11c {
  import Tables._

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q223
    // Scale shape: a 3× segment explode + (seg_idx, seg) equi-join +
    // distinct + verify — never an all-pairs comparison; candidate volume
    // is the segment-collision count. Honest caveat, documented: the
    // 3-segment pigeonhole is COMPLETE for substitution-only lev ≤ 2
    // (equal-length names here); an insert+delete shift can evade it on
    // general strings, where the deletion-neighborhood variant is the
    // production form — on this data the shared 'Customer#' prefix keeps
    // segment 1 equal for every pair, so the brute oracle proves no miss.
    // The carve (< 200) is SF-independent, like q83's.
    "q223_editdist_join" -> QDef(
      (s, d) => {
        val c = customer(s, d).where(col("c_custkey") < 200)
          .select(col("c_custkey").as("ck"), col("c_name").as("nm"))
        val segs = c.select(col("ck"), col("nm"),
            posexplode(array(substring(col("nm"), 1, 6),
              substring(col("nm"), 7, 6), substring(col("nm"), 13, 6))))
          .withColumnsRenamed(Map("pos" -> "seg_idx", "col" -> "seg"))
        val cand = segs.as("x").join(segs.as("y"),
            col("x.seg_idx") === col("y.seg_idx") &&
              col("x.seg") === col("y.seg") && col("x.ck") < col("y.ck"))
          .select(col("x.ck").as("ck_a"), col("x.nm").as("nm_a"),
            col("y.ck").as("ck_b"), col("y.nm").as("nm_b"))
          .distinct()
        cand.withColumn("lev", levenshtein(col("nm_a"), col("nm_b")))
          .where(col("lev") <= 2)
          .select(col("ck_a"), col("ck_b"), col("lev").cast("long").as("lev"))
          .orderBy("ck_a", "ck_b")
      },
      """WITH c AS (SELECT c_custkey AS ck, c_name AS nm FROM customer
        |           WHERE c_custkey < 200)
        |SELECT a.ck AS ck_a, b.ck AS ck_b,
        |       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS lev
        |FROM c a JOIN c b ON a.ck < b.ck
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |ORDER BY ck_a, ck_b""".stripMargin
    ),

    // --------------------------------------------------------------- q224
    // Scale shape: positives come from the q221 simhash spanning stage
    // (the corpus has NO exact-dup texts — CLAUDE.md's adversarial-corpus
    // note — so contrastive positives are the near-dup pairs, carved 1/7
    // by anchor, q73's style); the negative draw is a map-side ×3 explode
    // + portable-md5 arithmetic against a 1-row broadcast max; the only
    // data join is the validating equi-join against the doc table keyed
    // by neg_id. Hash draws make the triplet set a pure function of the
    // corpus — stable under retries, partitioning, and engine (the
    // oracle replays the draw). Self/positive collisions are dropped
    // rather than re-probed (≤ k negatives per positive — the standard
    // contrastive-sampling trade; re-probing needs a loop for a
    // vanishing case).
    "q224_negative_sampling" -> QDef(
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("lang"))
        val pos = Round11b.spanningPairs(s, d)
          .where(col("doc_a") % 7 === 0)
          .select(col("doc_a").as("anchor"), col("doc_b").as("pos_id"))
        val mx = docs.agg(max("doc_id").as("mx"))
        val trip = pos.crossJoin(broadcast(mx))
          .select(col("anchor"), col("pos_id"), col("mx"),
            explode(expr("sequence(0, 2)")).as("i"))
          .withColumn("neg_id",
            conv(substring(md5(concat_ws("#", col("anchor"), col("pos_id"),
              col("i"))), 1, 15), 16, 10).cast("long") % (col("mx") + 1))
          .where(col("neg_id") =!= col("anchor") && col("neg_id") =!= col("pos_id"))
        trip.join(docs.select(col("doc_id").as("neg_id"),
            col("lang").as("neg_lang")), "neg_id")
          .select(col("anchor"), col("pos_id"), col("i"), col("neg_id"),
            col("neg_lang"))
          .orderBy("anchor", "pos_id", "i", "neg_id")
      },
      s"""WITH ${Round11b.oracleSpanningPairs},
         |pos AS (SELECT doc_a AS anchor, doc_b AS pos_id FROM pairs
         |        WHERE doc_a % 7 = 0),
         |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
         |trip AS (
         |  SELECT anchor, pos_id, CAST(ii.i AS INTEGER) AS i,
         |         CAST(('0x' || substring(md5(anchor || '#' || pos_id || '#' || ii.i),
         |           1, 15)) AS BIGINT) % (mx.mx + 1) AS neg_id
         |  FROM pos CROSS JOIN mx
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) ii)
         |SELECT t.anchor, t.pos_id, t.i, t.neg_id, d.lang AS neg_lang
         |FROM trip t JOIN documents d ON d.doc_id = t.neg_id
         |WHERE t.neg_id <> t.anchor AND t.neg_id <> t.pos_id
         |ORDER BY anchor, pos_id, i, neg_id""".stripMargin
    )
  )
}

package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-10 batch 8: q183 deterministic train/val/test split manifests
  * (the assignment every training run must reproduce bit-for-bit), q184
  * collation-aware grouping (the Spark 4 collation surface), and q185
  * null-safe join semantics (`<=>` / IS NOT DISTINCT FROM).
  */
object Round10h {
  import Tables._

  /** q69's portable md5 bucket, shared spelling (Curation.md5Bucket). */
  private def md5Bucket(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 100

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q183
    // Train/val/test split manifest: every doc lands in exactly one split
    // by portable md5 bucket (80/10/10) — stable under re-partitioning,
    // re-runs, and corpus growth (an existing doc's split never changes,
    // the property a training pipeline needs to avoid eval contamination
    // across runs). Output is the (split, lang) manifest with per-lang
    // shares. One map-side-combinable aggregate, no shuffle before it.
    "q183_train_val_split" -> QDef(
      (s, d) => {
        val b = md5Bucket(col("doc_id"))
        documents(s, d)
          .withColumn("split",
            when(b < 80, "train").when(b < 90, "val").otherwise("test"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
          .orderBy("split", "lang")
      },
      """SELECT CASE
        |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |       lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    ),

    // --------------------------------------------------------------- q184
    // Collation-aware grouping (Spark 4 COLLATE): a mixed-case language
    // column (every other doc upper-cased — the dirty-data shape collation
    // exists for) grouped under UTF8_LCASE so 'EN' and 'en' merge
    // engine-side, no manual lower() in the grouping key. The EMITTED key
    // is lower()'d explicitly: a collated group's representative value is
    // whichever variant the engine saw first — correct to group by,
    // nondeterministic to output. DuckDB replays via lower().
    "q184_collated_group" -> QDef(
      (s, d) =>
        documents(s, d)
          .withColumn("lang_dirty",
            when(col("doc_id") % 2 === 0, upper(col("lang"))).otherwise(col("lang")))
          .withColumn("lang_c", collate(col("lang_dirty"), "UTF8_LCASE"))
          .groupBy(col("lang_c"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("lang_dirty")).as("n_variants"))
          .select(lower(col("lang_c")).as("lang"), col("n_docs"), col("n_variants"))
          .orderBy("lang"),
      """WITH t AS (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
        |             AS lang_dirty
        |           FROM documents)
        |SELECT lower(lang_dirty) AS lang, COUNT(*) AS n_docs,
        |       COUNT(DISTINCT lang_dirty) AS n_variants
        |FROM t GROUP BY 1 ORDER BY lang""".stripMargin
    ),

    // --------------------------------------------------------------- q185
    // Null-safe join (`<=>` / IS NOT DISTINCT FROM): a sparse attribute
    // (price band, NULL for mid-range orders) joined to itself
    // null-safely, so the NULL band matches the NULL band — counting
    // same-band order pairs per band INCLUDING the null band, which a
    // plain equi-join silently drops (NULL = NULL is never true). The
    // join stays an equi-join on the null-safe key. Pair counting on a
    // 3-value key is Θ(n²/3) BY OUTPUT — the 1-in-100 orderkey carve
    // bounds it at declared-test scale (the q47/q48 sampled-twin
    // convention; the triangular-number identity is what InvariantSpec
    // checks, carve-independent).
    "q185_null_safe_join" -> QDef(
      (s, d) => {
        val banded = orders(s, d)
          .where(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"),
            when(col("o_totalprice") < 50000, "low")
              .when(col("o_totalprice") >= 300000, "high").as("band"))
        banded.as("a")
          .join(banded.as("b"),
            col("a.band") <=> col("b.band") &&
              col("a.o_orderkey") < col("b.o_orderkey"))
          .groupBy(coalesce(col("a.band"), lit("NULL_BAND")).as("band"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("band")
      },
      """WITH banded AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_totalprice < 50000 THEN 'low'
        |              WHEN o_totalprice >= 300000 THEN 'high' END AS band
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT COALESCE(a.band, 'NULL_BAND') AS band, COUNT(*) AS n_pairs
        |FROM banded a JOIN banded b
        |  ON a.band IS NOT DISTINCT FROM b.band
        | AND a.o_orderkey < b.o_orderkey
        |GROUP BY 1 ORDER BY band""".stripMargin
    )
  )
}

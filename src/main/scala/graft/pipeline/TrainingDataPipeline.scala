package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops
import graft.ops.Dedup

/** Per-stage row counts — the pipeline's audit trail. */
case class PipelineReport(
    input: Long,
    afterQuality: Long,
    afterLang: Long,
    afterExactDedup: Long,
    afterNearDedup: Long,
    outPath: String
)

/** The end-to-end training-data curation pipeline, composed from the
  * library's operators — the workload this engine exists for, run as ONE
  * declarative flow:
  *
  *   ingest → quality filter (q50 scoring) → language filter →
  *   exact dedup (first-by-hash) → near-dup cluster dedup
  *   (MinHash-LSH pairs q46 → connected components) →
  *   partitioned parquet write (lang-partitioned layout → partition
  *   pruning for every downstream per-language job)
  *
  * Every stage is deterministic, so pipeline re-runs are reproducible —
  * the property that makes dataset versioning meaningful.
  */
object TrainingDataPipeline {

  def run(
      spark: SparkSession,
      sfDir: String,
      outPath: String,
      minQuality: Double = 0.55,
      langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")
  ): PipelineReport = {
    val docs = Tables.documents(spark, sfDir)

    // quality scoring (the q50 formula), filter low-quality docs. Score
    // ONCE and materialize: every stage count and the dedup chain derive
    // from this table instead of re-scanning + re-scoring the corpus per
    // action (the q78/q80 lesson — re-deriving the HOF quality expression
    // per branch dominated the audit query's cost).
    val stops = array(Seq("a", "the", "row", "value", "table", "and", "of").map(lit): _*)
    val scored = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop", size(filter(col("toks"), t => array_contains(stops, t))).cast("long"))
      .withColumn(
        "quality",
        lit(0.5) * (col("n_distinct") / col("n_toks")) +
          lit(0.3) * (lit(1.0) - col("n_stop") / col("n_toks")) +
          lit(0.2) * (least(col("n_toks"), lit(100L)) / 100.0)
      )
      .drop("toks", "n_distinct", "n_stop")
      .localCheckpoint()
    val nInput = scored.count()
    val qualityKept = scored.where(col("quality") >= minQuality && col("n_toks") >= 10)
    val nQuality = qualityKept.count()

    // language filter
    val langKept = qualityKept.where(col("lang").isin(langs: _*))
    val nLang = langKept.count()

    // exact dedup: keep the smallest doc_id per identical text
    // (xxhash64 pre-grouping keeps the shuffle key 8 bytes at scale; the
    // row_number tie-break keeps it deterministic under collisions)
    val w = Window.partitionBy(xxhash64(col("text")), col("text")).orderBy("doc_id")
    val exactDeduped = langKept
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
    val nExact = exactDeduped.count()

    // near-dup dedup: MinHash-LSH pairs computed over the POST-FILTER doc
    // set (round-1 ADVICE: reusing q46 verbatim sampled doc_id % 3, capped
    // pairs at its top-100 LIMIT, and could anti-join a cluster member away
    // when its min-id canonical had already been removed by the
    // quality/lang filters), clustered by connected components, keep the
    // canonical min-id doc — which now always exists among the survivors.
    val pairs = ops.LlmExt2.minhashLshPairs(exactDeduped).select("doc_a", "doc_b")
    val nearDeduped = Dedup.dedupByCluster(exactDeduped, pairs)
    val nNear = nearDeduped.count()

    // lang-partitioned layout: every per-language downstream job prunes
    // to its own directory
    nearDeduped
      .select("doc_id", "lang", "source", "n_chars", "quality", "text")
      .write.mode("overwrite").partitionBy("lang").parquet(outPath)

    PipelineReport(nInput, nQuality, nLang, nExact, nNear, outPath)
  }
}

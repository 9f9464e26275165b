package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 batch 17: REAL byte-pair-encoding merge training (q211) and
  * applying the learned merges for per-stratum tokenizer fertility
  * (q212) — the missing piece between q61's BPE-regex pre-tokenizer and
  * q165's fertility audit, which both assume a merge table exists.
  *
  * The trainer is the textbook corpus-level greedy BPE loop with the
  * iteration count a FIXED contract (3 unrolled rounds, no driver loop):
  * count adjacent-symbol pairs weighted by word frequency, merge the
  * most frequent pair, repeat. Everything is exact and portable:
  *  - pair counts are int64 sums of word counts;
  *  - the argmax tie-break is a total order (max n, then MIN "p1 p2"
  *    string — both engines compare the identical bytes);
  *  - a merge round applies literal `replace` TWICE — one left-to-right
  *    non-overlapping pass (identical semantics in Spark and DuckDB,
  *    probed) catches odd occurrences of runs the first pass split;
  *    two passes cover runs ≤ 4 of the same symbol and ARE the contract,
  *    so both engines segment identically regardless of run length.
  * Scale shape: the word table is vocabulary-sized (31 rows here; any
  * real vocab ≪ corpus) — ONE corpus scan builds it, then every
  * training step is arithmetic on that broadcast-scale table; only the
  * q212 apply join (vocab broadcast to the token stream) touches the
  * corpus again. This is exactly how production BPE trainers scale: the
  * corpus collapses to (word, count) once, training never rescans it.
  */
object Round10q {
  import Tables._

  /** Adjacent-symbol pair counts of a segmentation, weighted by word
    * frequency: (p1, p2, n). */
  private def pairsOf(seg: DataFrame): DataFrame = seg
    .select(col("wc"), split(trim(col("s")), " ").as("a"))
    .select(col("wc"),
      expr("slice(a, 1, size(a) - 1)").as("pa"),
      expr("slice(a, 2, size(a) - 1)").as("ta"))
    .select(col("wc"), explode(arrays_zip(col("pa"), col("ta"))).as("bg"))
    .groupBy(col("bg.pa").as("p1"), col("bg.ta").as("p2"))
    .agg(sum("wc").as("n"))

  /** The winning merge: max count, ties to the lexicographically least
    * "p1 p2" key — a 1-row grouping-free aggregate (NLJ-gate bounded). */
  private def bestOf(pairs: DataFrame): DataFrame =
    pairs.crossJoin(broadcast(pairs.agg(max("n").as("mx"))))
      .where(col("n") === col("mx"))
      .agg(min(concat_ws(" ", col("p1"), col("p2"))).as("bp"),
        max("n").as("n"))
      .select(split(col("bp"), " ").getItem(0).as("p1"),
        split(col("bp"), " ").getItem(1).as("p2"), col("n"))

  /** One merge round: the two-pass literal replace described above. */
  private def applyMerge(seg: DataFrame, best: DataFrame): DataFrame =
    seg.crossJoin(broadcast(best))
      .withColumn("pat",
        concat(lit(" "), col("p1"), lit(" "), col("p2"), lit(" ")))
      .withColumn("rep", concat(lit(" "), col("p1"), col("p2"), lit(" ")))
      .select(col("word"), col("wc"),
        expr("replace(replace(s, pat, rep), pat, rep)").as("s"))

  /** 3 unrolled training rounds over the (word, count) table. Returns
    * (merges b1..b3, segmentations seg1..seg3). seg0/seg1/seg2 are
    * localCheckpointed — each feeds the next round's pair count AND
    * merge application (and seg0's lineage is the one corpus scan);
    * the 1-row bests and final segs are single-lineage and stay lazy. */
  private[graft] def bpeTrain(docs: DataFrame): (Seq[DataFrame], Seq[DataFrame]) = {
    val seg0 = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"),
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("s"))
      .localCheckpoint()
    val b1 = bestOf(pairsOf(seg0))
    val seg1 = applyMerge(seg0, b1).localCheckpoint()
    val b2 = bestOf(pairsOf(seg1))
    val seg2 = applyMerge(seg1, b2).localCheckpoint()
    val b3 = bestOf(pairsOf(seg2))
    val seg3 = applyMerge(seg2, b3)
    (Seq(b1, b2, b3), Seq(seg1, seg2, seg3))
  }

  /** The identical training pipeline as DuckDB CTEs: binds seg0..seg3
    * and b1..b3. */
  private val oracleTrain = {
    def round(r: Int) =
      s"""pr$r AS (
         |  SELECT a[i] AS p1, a[i + 1] AS p2, CAST(SUM(wc) AS BIGINT) AS n
         |  FROM (SELECT wc, a, unnest(generate_series(1, len(a) - 1)) AS i
         |        FROM (SELECT wc, string_split(trim(s), ' ') AS a
         |              FROM seg${r - 1}) x) y
         |  GROUP BY 1, 2),
         |b$r AS (
         |  SELECT string_split(MIN(p1 || ' ' || p2), ' ')[1] AS p1,
         |         string_split(MIN(p1 || ' ' || p2), ' ')[2] AS p2,
         |         CAST(MAX(n) AS BIGINT) AS n
         |  FROM pr$r WHERE n = (SELECT MAX(n) FROM pr$r)),
         |seg$r AS (
         |  SELECT word, wc,
         |         replace(replace(s, ' '||p1||' '||p2||' ',
         |                            ' '||p1||p2||' '),
         |                 ' '||p1||' '||p2||' ', ' '||p1||p2||' ') AS s
         |  FROM seg${r - 1} CROSS JOIN b$r)""".stripMargin
    s"""wc AS (
       |  SELECT word, COUNT(*) AS wc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents) t
       |  GROUP BY 1),
       |seg0 AS (
       |  SELECT word, wc, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s
       |  FROM wc),
       |${round(1)},
       |${round(2)},
       |${round(3)}""".stripMargin
  }

  val defs: Vector[(String, QDef)] = Vector(

    // --------------------------------------------------------------- q211
    // The learned merge table: per round the merged pair, its weighted
    // pair count at selection time, and the corpus-wide segment count
    // AFTER applying it — the convergence curve a tokenizer build
    // monitors (each row's segment drop = pair_n · occurrences merged).
    "q211_bpe_train" -> QDef(
      (s, d) => {
        val (bs, segs) = bpeTrain(documents(s, d))
        (1 to 3).map { r =>
          bs(r - 1).crossJoin(broadcast(segs(r - 1)
            .agg(sum(col("wc") * size(split(trim(col("s")), " ")))
              .as("corpus_segments_after"))))
            .select(lit(r).as("rnd"), col("p1"), col("p2"),
              col("n").as("pair_n"), col("corpus_segments_after"))
        }.reduce(_.unionByName(_)).orderBy("rnd")
      },
      s"""WITH $oracleTrain
         |SELECT * FROM (
         |  SELECT CAST(1 AS INT) AS rnd, p1, p2, n AS pair_n,
         |    (SELECT CAST(SUM(wc * len(string_split(trim(s), ' '))) AS BIGINT)
         |     FROM seg1) AS corpus_segments_after FROM b1
         |  UNION ALL
         |  SELECT CAST(2 AS INT), p1, p2, n,
         |    (SELECT CAST(SUM(wc * len(string_split(trim(s), ' '))) AS BIGINT)
         |     FROM seg2) FROM b2
         |  UNION ALL
         |  SELECT CAST(3 AS INT), p1, p2, n,
         |    (SELECT CAST(SUM(wc * len(string_split(trim(s), ' '))) AS BIGINT)
         |     FROM seg3) FROM b3
         |) ORDER BY rnd""".stripMargin
    ),

    // --------------------------------------------------------------- q212
    // Apply the learned merges: per (lang, source) stratum the word
    // count, post-merge segment count, and tokenizer fertility
    // (segments/word — the q165 metric, now against a TRAINED segmenter
    // instead of a fixed regex). Scale shape: the per-word segment
    // length is a vocab-sized broadcast; the corpus-side work is one
    // map-side explode + a (lang, source) rollup.
    "q212_bpe_apply" -> QDef(
      (s, d) => {
        val (_, segs) = bpeTrain(documents(s, d))
        val segN = segs(2).select(col("word"),
          size(split(trim(col("s")), " ")).as("n_seg"))
        documents(s, d).select(col("lang"), col("source"),
            explode(split(col("text"), " ")).as("word"))
          .join(broadcast(segN), "word")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_words"), sum("n_seg").as("n_segments"))
          .withColumn("fertility",
            col("n_segments").cast("double") / col("n_words"))
          .orderBy("lang", "source")
      },
      s"""WITH $oracleTrain,
         |segN AS (
         |  SELECT word, len(string_split(trim(s), ' ')) AS n_seg FROM seg3),
         |tokd AS (
         |  SELECT lang, source, unnest(string_split(text, ' ')) AS word
         |  FROM documents)
         |SELECT lang, source, COUNT(*) AS n_words,
         |       CAST(SUM(n_seg) AS BIGINT) AS n_segments,
         |       CAST(CAST(SUM(n_seg) AS BIGINT) AS DOUBLE) / COUNT(*)
         |         AS fertility
         |FROM tokd JOIN segN USING (word)
         |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin
    )
  )
}

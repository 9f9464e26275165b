package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ann

/** IVF ANN (ops/Ann.scala) — the k-means two-stage shape SCALE.md §5
  * promises next to q52's LSH buckets. Locked here:
  *  1. the index partitions the vectors exactly (every vector in exactly
  *     one inverted list);
  *  2. nprobe == nlist (probe everything) reproduces exact brute-force
  *     top-k BIT-FOR-BIT — the approximation knob trades only coverage;
  *  3. partial probing keeps deterministic, non-trivial recall on this
  *     corpus (embeddings are noise — CLAUDE.md — so recall tracks the
  *     probed fraction; the floor guards candidate generation breakage);
  *  4. plan shape: the vector side is broadcast-joined to centroid-scale
  *     tables only — no vector×vector join anywhere.
  */
class AnnIvfSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  private val NList = 16
  private val K = 5

  private lazy val vectors = Tables.embeddings(spark, sf01)
  private lazy val queries = vectors.where(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qe"))
  private lazy val (index, centroids) = Ann.ivfIndex(vectors, NList)

  private def bruteTopK(): Map[(Long, Int), Long] = {
    val e = vectors.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
      .withColumn("n2", graft.plans.DotProduct.norm2(col("e")))
    val q = queries.select(col("qid"), col("qe").cast("array<double>").as("qe"))
      .withColumn("qn", graft.plans.DotProduct.norm2(col("qe")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        graft.plans.DotProduct.dot(col("qe"), col("e")) / sqrt(col("qn") * col("n2")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= K)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) -> r.getAs[Long]("vec_id"))
      .toMap
  }

  test("index partitions the vectors: every vector in exactly one list, lists spread") {
    val n = vectors.count()
    assert(index.count() == n)
    assert(index.select("vec_id").distinct().count() == n)
    assert(centroids.count() == NList.toLong)
    // the quantizer must actually spread the corpus — a collapsed index
    // (everything in one list) would make every recall number vacuous
    val sizes = index.groupBy("list_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    info(s"list sizes: ${sizes.toVector.sortBy(_._1).map(_._2).mkString(",")}")
    assert(sizes.size >= NList / 2, s"only ${sizes.size} non-empty lists")
    assert(sizes.values.max <= n / 2, s"hot list holds ${sizes.values.max}/$n vectors")
  }

  test("nprobe == nlist reproduces exact brute-force top-k bit-for-bit") {
    val full = Ann.ivfTopK(index, centroids, queries, K, nprobe = NList)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) -> r.getAs[Long]("vec_id"))
      .toMap
    val brute = bruteTopK()
    assert(full.nonEmpty)
    assert(full == brute,
      s"diff=${(brute.toSet -- full.toSet).take(5)} / ${(full.toSet -- brute.toSet).take(5)}")
  }

  test("partial probe (nprobe=4/16) recall is deterministic and above the floor") {
    val part = Ann.ivfTopK(index, centroids, queries, K, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val brute = bruteTopK().map { case ((qid, _), vid) => (qid, vid) }.toSet
    val recall = (part & brute).size.toDouble / brute.size
    info(f"IVF recall@$K with nprobe=4/$NList: $recall%.3f")
    // noise embeddings: neighbors are ~uniform over lists, so recall tracks
    // the probed fraction (0.25) — the floor catches a broken quantizer,
    // not a quality promise on this adversarial corpus
    assert(recall >= 0.15, f"recall collapsed: $recall%.3f")
  }

  test("ivfTopKLargeQ (shuffle-join probed table) is row-identical to ivfTopK") {
    // round-3 ADVICE: ivfTopK broadcasts the probed QUERY table, which is
    // query-scale; the large-Q variant must keep identical semantics and
    // tie-breaks while joining on list_id without that broadcast.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toMap
    for (nprobe <- Seq(4, NList)) {
      val b = rows(Ann.ivfTopK(index, centroids, queries, K, nprobe))
      val s = rows(Ann.ivfTopKLargeQ(index, centroids, queries, K, nprobe))
      assert(b.nonEmpty && s == b, s"nprobe=$nprobe diverged")
    }
  }

  test("a null embedding element fails the index build loudly (ADVICE r11)") {
    // a null element nulls the distance fold against every centroid; the
    // argmin's dist === bd filter would then silently DROP the vector from
    // the index — the ingest guard must raise instead (ivfIndex's eager
    // checkpoint materializes the guarded projection)
    val bad = spark.sql(
      """SELECT * FROM VALUES
        |  (0L, array(1.0D, 2.0D)), (1L, array(2.0D, 1.0D)),
        |  (2L, array(CAST(NULL AS DOUBLE), 3.0D))
        |AS t(vec_id, embedding)""".stripMargin)
    val e = intercept[Exception] { Ann.ivfIndex(bad, 2) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("vanish")), s"unexpected failure: $e")
  }

  test("plan shape: vectors are never self-joined; centroid joins broadcast") {
    val plan = Ann.ivfTopK(index, centroids, queries, K, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "centroid-scale tables must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "no vector-side shuffle join should exist at this scale")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 compositions (ops/Round13.scala). Locked here:
  *  1. q244's probe=1 restriction IS q234's graph — edge-for-edge with
  *    identical distances (the rank-1 probe is the argmin assignment),
  *    so the audit's "single-probe" side audits the declared q234;
  *  2. q243's loss is real and its fix monotone: some carve vector loses
  *     brute neighbors under single-probe, and per vector the 2-probe
  *     hit count is >= the single-probe hit count (candidate-superset
  *     top-k under one consistent total order can only gain);
  *  3. q245's keeper == the JVM argmax(quality, tie min id) replay over
  *     the chain clusters, and the quality rule genuinely diverges from
  *     the min-id rule on this corpus (else the query is a no-op);
  *  4. q246 composed (PRE-filter) recall >= the POST-filtered variant at
  *     the identical shortlist budget against the filtered-exact ground
  *     truth, and every returned vid satisfies the predicate.
  */
class Round13Spec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  // ---- q244 / q234 --------------------------------------------------
  test("q244: probe=1 slice reproduces q234's graph edge-for-edge") {
    val run = SparkEntry.queries
    val single = run("q234_knn_graph")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("nbr_rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Long]("d2"))).toSet
    val multi = ops.Round13.knnCand(Tables.embeddings(spark, sf01), 2)
      .where(col("probe") === 1)
      .withColumn("nbr_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("d2"), col("nbr_id"))))
      .where(col("nbr_rank") <= 3)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("nbr_rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Long]("d2"))).toSet
    assert(single.nonEmpty && multi == single,
      s"missing=${(single -- multi).take(3)} extra=${(multi -- single).take(3)}")
  }

  // ---- q243 ----------------------------------------------------------
  test("q243: boundary loss is non-vacuous and multi-probe gains monotonically per vector") {
    val rows = SparkEntry.queries("q243_knn_graph_recall")(spark, sf01)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_hit_1p"),
        r.getAs[Long]("n_hit_2p")))
    assert(rows.nonEmpty)
    // the IVF-boundary loss must be visible on this corpus, else the
    // audit certifies nothing
    assert(rows.exists(_._2 < 3), "single-probe graph recall is perfect — audit vacuous")
    // candidate-superset top-3 under the consistent (d2, nbr_id) order
    // can only recover more of the true top-3
    rows.foreach { case (id, h1, h2) =>
      assert(h2 >= h1, s"vec $id: 2-probe hits $h2 < single-probe $h1")
    }
    val (m1, m2) = (rows.map(_._2).sum.toDouble / (3.0 * rows.length),
      rows.map(_._3).sum.toDouble / (3.0 * rows.length))
    info(f"graph recall@3 — single-probe: $m1%.3f, 2-probe: $m2%.3f (${rows.length} carve vectors)")
    assert(m2 > m1, "2-probe graph shows no aggregate gain on this corpus")
  }

  // ---- q245 ----------------------------------------------------------
  test("q245: keeper == the JVM argmax(quality, tie min id) replay; diverges from min-id") {
    val docs = Tables.documents(spark, sf01)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text"))).toSeq
    def quality(text: String): Double = {
      val tk = text.split(" ")
      val n = tk.length.toLong
      val nd = tk.distinct.length.toLong
      val stops = Set("a", "the", "row", "value", "table", "and", "of")
      val ns = tk.count(stops.contains).toLong
      0.5 * (nd.toDouble / n) + 0.3 * (1.0 - ns.toDouble / n) +
        0.2 * (math.min(n, 100L).toDouble / 100.0)
    }
    val expected = docs.groupBy(d => (d._2, d._3)).values.toSeq
      .map(_.sortBy(_._1).take(3)).filter(_.size >= 2)
      .map { memb =>
        val cluster = memb.map(_._1).min
        val qs = memb.map(d => (d._1, quality(d._4)))
        val qmax = qs.map(_._2).max
        val keeper = qs.filter(_._2 == qmax).map(_._1).min
        (cluster, memb.size.toLong, keeper, qmax, cluster)
      }.toSet
    val got = SparkEntry.queries("q245_quality_keeper")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("keeper_id"), r.getAs[Double]("keeper_quality"),
        r.getAs[Long]("min_id"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.exists(r => r._3 != r._5),
      "quality keeper never diverges from min-id — the composition is a no-op here")
  }

  // ---- q246 ----------------------------------------------------------
  test("q246: pre-filtered composition recall >= post-filtered at equal shortlist budget") {
    val emb = Tables.embeddings(spark, sf01)
    val qv = ops.Round11.quantized(emb)
    def d2of(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val (ad, bd) = (a.cast("array<double>"), b.cast("array<double>"))
      (graft.plans.DotProduct.norm2(ad) + graft.plans.DotProduct.norm2(bd)
        - lit(2.0) * graft.plans.DotProduct.dot(ad, bd)).cast("long")
    }
    val q = qv.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv")).limit(10)
    // filtered-exact ground truth: brute top-5 under the predicate
    val truth = qv.where(col("vec_id") % 3 === 0)
      .crossJoin(broadcast(q)).where(col("vec_id") =!= col("qid"))
      .withColumn("d2", d2of(col("v"), col("qv")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("d2"), col("vec_id"))))
      .where(col("rnk") <= 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    // composed (pre-filter, the declared q246)
    val pre = SparkEntry.queries("q246_serving_composed")(spark, sf01)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid"))).toSet
    pre.foreach { case (_, vid) =>
      assert(vid % 3 == 0, s"composed result violates the predicate: $vid")
    }
    // post-filtered variant: UNFILTERED shortlist-50, predicate applied
    // after, exact re-rank top-5 — the naive composition q246 exists to beat
    val post = ops.Round11.ivfPqTopK(emb, nprobe = 2, k = 50)
      .select("qid", "vid")
      .where(col("vid") % 3 === 0)
      .join(qv.select(col("vec_id").as("vid"), col("v")), "vid")
      .join(broadcast(q), "qid")
      .withColumn("d2", d2of(col("v"), col("qv")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("d2"), col("vid"))))
      .where(col("rnk") <= 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid"))).toSet
    // ADC-only filtered variant (no exact re-rank): the other component
    // at equal budget — the composition must not lose to it either
    val adcOnly = ops.Round11.ivfPqTopK(emb, nprobe = 2, k = 5,
        indexFilter = col("vec_id") % 3 === 0)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid"))).toSet
    val (recPre, recPost, recAdc) = ((pre & truth).size.toDouble / truth.size,
      (post & truth).size.toDouble / truth.size,
      (adcOnly & truth).size.toDouble / truth.size)
    info(f"filtered recall@5 — pre-filter+rerank (q246): $recPre%.3f, post-filter: $recPost%.3f, ADC-only filtered: $recAdc%.3f")
    assert(recPre >= recPost,
      f"pre-filtering lost recall: $recPre%.3f < post $recPost%.3f")
    assert(recPre >= recAdc,
      f"re-rank lost recall: $recPre%.3f < ADC-only $recAdc%.3f")
    // the pre-filtered shortlist always fills from in-predicate vectors,
    // so the result set must be at least as large as the post-filtered one
    assert(pre.size >= post.size)
  }
}

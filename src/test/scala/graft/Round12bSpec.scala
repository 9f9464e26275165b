package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 batch 2 (ops/Round12b.scala). Each query is re-derived HERE
  * with plain JVM Long/Double math over the collected sf0.01 embeddings —
  * an oracle independent of BOTH engines (Spark and DuckDB), on top of the
  * DuckDB parity the driver runs. Locked:
  *  1. q231 removes EXACTLY the planted twin set (vec_id % 17 = 5, id +
  *     10000), each with its original as keeper and cos ≥ 0.999 — and
  *     never a noise pair (τ = 0.8 vs the measured 0.513 noise ceiling);
  *  2. q232 equals the JVM reimplementation end-to-end (sign words,
  *     Hamming top-50 shortlist, exact-grid re-rank top-5);
  *  3. q233's hits equal the JVM overlap of full-64 vs head-16 exact
  *     top-5s, and the truncation loss is real on this corpus (some
  *     query's hits < 5).
  */
class Round12bSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  // ---- shared JVM ground truth -------------------------------------
  private lazy val vecs: Map[Long, Array[Long]] =
    Tables.embeddings(spark, sf01).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      .toMap

  private def d2(a: Array[Long], b: Array[Long], dims: Int = 64): Long =
    (0 until dims).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum

  private def top5(qid: Long, dist: Long => Long): Seq[Long] =
    vecs.keys.filter(_ != qid).toSeq
      .map(v => (dist(v), v)).sorted.take(5).map(_._2)

  test("q231: removed set == planted twins, keeper == original, no noise pair fires") {
    val rows = SparkEntry.queries("q231_semdedup")(spark, sf01).collect()
    val planted = vecs.keys.filter(_ % 17 == 5).map(id => (id + 10000L) -> id).toMap
    assert(rows.length == planted.size,
      s"expected exactly ${planted.size} removals, got ${rows.length}")
    rows.foreach { r =>
      val (removed, keeper) = (r.getAs[Long]("removed"), r.getAs[Long]("keeper"))
      assert(planted.get(removed).contains(keeper),
        s"non-planted removal ($removed, keeper $keeper)")
      assert(r.getAs[Double]("cos_sim") >= 0.999)
    }
  }

  test("q232: matches the JVM sign-word/Hamming/re-rank reimplementation") {
    // sign off the RAW float (the query tests embedding > 0; the 1e6 grid
    // floor can flip sign for 0 < x < 1e-6, so recompute from floats)
    val raw: Map[Long, Array[Float]] =
      Tables.embeddings(spark, sf01).select("vec_id", "embedding").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[Seq[Float]]("embedding").toArray).toMap
    def word(v: Array[Float], lo: Int): Long =
      (0 until 32).map(i => if (v(lo + i) > 0) 1L << i else 0L).sum
    val codes = raw.map { case (id, v) => id -> (word(v, 0), word(v, 32)) }
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1).toLong +
        java.lang.Long.bitCount(a._2 ^ b._2).toLong
    val expected = (0L until 10L).flatMap { qid =>
      val qc = codes(qid)
      val short = codes.view.filterKeys(_ != qid).toSeq
        .map { case (v, c) => (ham(c, qc), v) }.sorted.take(50)
      val qv = vecs(qid)
      short.map { case (h, v) => (d2(vecs(v), qv), v, h) }.sorted.take(5)
        .zipWithIndex.map { case ((dd, v, h), i) => (qid, v, h, dd, i + 1) }
    }.toSet
    val got = SparkEntry.queries("q232_hamming_ann")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid"), r.getAs[Long]("ham"),
        r.getAs[Long]("d2"), r.getAs[Int]("rnk"))).toSet
    assert(got == expected,
      s"q232 mismatch: extra=${(got -- expected).take(3)}, missing=${(expected -- got).take(3)}")
  }

  test("q234: matches the JVM one-Lloyd-iteration kNN-graph replay end-to-end") {
    // full engine-independent replay: seed centroids, argmin assign with
    // the encoded primitive key, floor(mean) Lloyd update with the
    // empty-cluster guard, reassign, per-cell top-3 by (d2, nbr_id)
    def assign(cent: Map[Long, Array[Long]], x: Array[Long]): Long =
      cent.toSeq.map { case (j, c) => d2(x, c) * 8 + j }.min % 8
    val seeds = (0L until 8L).map(j => j -> vecs(j)).toMap
    val asg0 = vecs.map { case (id, x) => id -> assign(seeds, x) }
    val c1 = (0L until 8L).map { j =>
      val members = vecs.collect { case (id, x) if asg0(id) == j => x }.toSeq
      j -> (if (members.isEmpty) seeds(j)
            else Array.tabulate(64)(i =>
              math.floor(members.map(_(i)).sum.toDouble / members.size).toLong))
    }.toMap
    val asg1 = vecs.map { case (id, x) => id -> assign(c1, x) }
    val expected = vecs.keys.toSeq.sorted.flatMap { id =>
      vecs.keys.filter(o => o != id && asg1(o) == asg1(id)).toSeq
        .map(o => (d2(vecs(o), vecs(id)), o)).sorted.take(3)
        .zipWithIndex.map { case ((dd, o), i) =>
          (id, i + 1, o, asg1(id), dd) }
    }.toSet
    val got = SparkEntry.queries("q234_knn_graph")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("nbr_rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Long]("list_id"), r.getAs[Long]("d2")))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty)
  }

  test("q223 (md5 basis): output == JVM brute lev<=2; every planted pair recovered; blocking non-vacuous") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cks = Tables.customer(spark, sf01).where(col("c_custkey") < 2000)
      .select("c_custkey").collect().map(_.getLong(0))
    val base = cks.map(ck => ck -> md5hex(ck.toString).substring(0, 18)).toMap
    val subst = base.collect { case (ck, nm) if ck % 10 == 7 =>
      val p = (ck % 13 + 3).toInt
      (ck + 100000L) -> (nm.substring(0, p - 1) + "z" + nm.substring(p)) }
    val shift = base.collect { case (ck, nm) if ck % 10 == 3 =>
      val p = (ck % 11 + 3).toInt
      (ck + 100000L) -> (nm.substring(0, p - 1) + nm.substring(p) + "q") }
    val all = (base ++ subst ++ shift).toArray.sortBy(_._1)
    // banded levenshtein, exact for values <= 2 (3 = "more than 2")
    def lev2(a: String, b: String): Int = {
      val (n, m) = (a.length, b.length)
      if (math.abs(n - m) > 2) return 3
      val INF = 9
      var prev = Array.tabulate(m + 1)(j => if (j <= 2) j else INF)
      for (i <- 1 to n) {
        val cur = Array.fill(m + 1)(INF)
        if (i <= 2) cur(0) = i
        for (j <- math.max(1, i - 2) to math.min(m, i + 2)) {
          val c = if (a(i - 1) == b(j - 1)) 0 else 1
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + c)
        }
        prev = cur
      }
      math.min(prev(m), 3)
    }
    val expected = (for {
      i <- all.indices.iterator
      j <- (i + 1) until all.length
      d = lev2(all(i)._2, all(j)._2) if d <= 2
    } yield (all(i)._1, all(j)._1, d.toLong)).toSet
    val got = SparkEntry.queries("q223_editdist_join")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("ck_a"), r.getAs[Long]("ck_b"), r.getAs[Long]("lev")))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // every plant fires, and the match set is exactly the plants (no
    // natural lev<=2 pair among random 18-hex strings) — so the candidate
    // join provably pruned all-pairs down to the planted collisions
    val planted = subst.keySet ++ shift.keySet
    assert(expected.map(_._2).toSet == planted.map(_.toLong),
      "match set is not exactly the planted twins")
    assert(expected.size == planted.size && expected.nonEmpty)
  }

  test("q233: hits equal the JVM full-vs-head-16 top-5 overlap; loss is real") {
    val got = SparkEntry.queries("q233_matryoshka_recall")(spark, sf01).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("hits")).toMap
    assert(got.keySet == (0L until 10L).toSet)
    val expected = (0L until 10L).map { qid =>
      val qv = vecs(qid)
      val full = top5(qid, v => d2(vecs(v), qv)).toSet
      val head = top5(qid, v => d2(vecs(v), qv, dims = 16)).toSet
      qid -> (full & head).size.toLong
    }.toMap
    assert(got == expected, s"q233 mismatch: got $got expected $expected")
    assert(expected.values.exists(_ < 5L),
      "truncation loss vanished — the audit would be vacuous on this corpus")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 batch 3 (ops/Round12c.scala). Each query is re-derived here
  * with plain JVM math over the collected sf0.01 tables — an oracle
  * independent of BOTH engines, on top of the driver's DuckDB parity.
  * Locked:
  *  1. q235 == the JVM gram/island replay, and the corpus carries real
  *     multi-token duplicated spans (non-vacuous);
  *  2. q236 == the JVM CDC replay, and the CDC RESYNC property holds:
  *     inserting one token changes only the chunks overlapping the edit
  *     window — the suffix chunk sequence is identical (the reason CDC
  *     beats fixed-width blocks under insertion);
  *  3. q237 == the JVM k-means + per-cell medoid replay end-to-end;
  *  4. q238 == the JVM brute corpus-wide max-LCP (true string equality,
  *     all pairs) — proving the windowless prefix-signature counting
  *     equals the all-pairs answer and is collision-free on this data.
  */
class Round12cSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docRows: Seq[(Long, String, String, String)] =
    Tables.documents(spark, sf01).select("doc_id", "lang", "source", "text")
      .collect().toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[String]("text")))

  private lazy val toks: Map[Long, Array[String]] =
    docRows.map { case (id, _, _, t) => id -> t.split(" ") }.toMap

  // ---- q235 ---------------------------------------------------------
  test("q235: spans == the JVM duplicated-8-gram island replay; real spans exist") {
    val grams = toks.toSeq.flatMap { case (id, tk) =>
      if (tk.length < 8) Seq.empty
      else (0 to tk.length - 8).map(i => (id, i + 1, tk.slice(i, i + 8).mkString(" ")))
    }
    val occ = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = grams.filter(g => occ(g._3) >= 2)
      .groupBy(_._1).toSeq.flatMap { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        // island split when start > prev start + 8 (equal-length intervals)
        val islands = ps.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
          if (acc.nonEmpty && p <= acc.last.last + 8) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        islands.map(is =>
          (id, is.head.toLong, is.last.toLong + 7,
            (is.last + 7 - is.head + 1).toLong, is.size.toLong))
      }.toSet
    val got = SparkEntry.queries("q235_dup_spans")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_toks"),
        r.getAs[Long]("n_grams"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.exists(_._4 > 8), "no multi-gram span — the coalescing is vacuous")
  }

  // ---- q236 ---------------------------------------------------------
  /** The declared query's chunker, in plain JVM math: token code = first
    * 8 md5 hex chars, rolling hash over the last 4 codes, boundary CLOSES
    * the chunk at p when p >= 4 and hash % 16 == 0. Returns
    * (1-based start position, chunk text). */
  private def cdcChunks(tk: Array[String]): Vector[(Int, String)] = {
    val codes = tk.map(t => java.lang.Long.parseLong(md5hex(t).substring(0, 8), 16))
    def brk(i: Int): Boolean = i >= 3 &&
      (codes(i) + 3 * codes(i - 1) + 9 * codes(i - 2) + 27 * codes(i - 3)) % 16 == 0
    val b = Vector.newBuilder[(Int, String)]
    var start = 0
    for (i <- tk.indices) {
      if (brk(i)) { b += ((start + 1, tk.slice(start, i + 1).mkString(" "))); start = i + 1 }
    }
    if (start < tk.length) b += ((start + 1, tk.slice(start, tk.length).mkString(" ")))
    b.result()
  }

  test("q236: duplicated chunks == the JVM CDC replay") {
    val chunks = docRows.flatMap { case (id, _, src, _) =>
      cdcChunks(toks(id)).map { case (_, text) => (id, src, text) }
    }
    val expected = chunks.groupBy(_._3).collect {
      case (text, xs) if xs.size >= 2 =>
        val ctoks = text.split(" ").length.toLong
        (md5hex(text), ctoks, xs.size.toLong,
          xs.map(_._1).distinct.size.toLong, xs.map(_._2).distinct.size.toLong,
          (xs.size - 1) * ctoks)
    }.toSet
    val got = SparkEntry.queries("q236_cdc_chunks")(spark, sf01).collect()
      .map(r => (r.getAs[String]("chunk_key"), r.getAs[Long]("ctoks"),
        r.getAs[Long]("n_occ"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"), r.getAs[Long]("saved_toks"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.nonEmpty, "no duplicated chunk — the rollup is vacuous")
  }

  test("q236: CDC resyncs after a single-token insertion (the anti-fixed-block property)") {
    val tk = toks.maxBy(_._2.length)._2
    val ins = 5 // insert a vocabulary-foreign token after position 5
    val edited = (tk.take(ins) :+ "xq-inserted") ++ tk.drop(ins)
    val orig = cdcChunks(tk)
    val mod = cdcChunks(edited)
    // chunks whose window never touches the edit: start > ins + 4 in the
    // original (shifted by one in the edited stream) must be IDENTICAL
    val origTail = orig.dropWhile(_._1 <= ins + 4).map(_._2)
    val modTail = mod.dropWhile(_._1 <= ins + 5).map(_._2)
    assert(origTail.nonEmpty, "doc too short to exercise the resync")
    assert(origTail == modTail,
      s"CDC failed to resync — suffix chunks differ: $origTail vs $modTail")
  }

  // ---- q237 ---------------------------------------------------------
  test("q237: medoids == the JVM k-means + argmin-sum replay end-to-end") {
    val vecs: Map[Long, Array[Long]] =
      Tables.embeddings(spark, sf01).select("vec_id", "embedding").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[Seq[Float]]("embedding")
            .map(x => math.floor(x.toDouble * 1e6).toLong).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 64).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
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
    val expected = asg1.groupBy(_._2).map { case (cell, m) =>
      val ids = m.keys.toSeq
      val sums = ids.map(id => (ids.map(o => d2(vecs(id), vecs(o))).sum, id))
      val minSum = sums.map(_._1).min
      val medoid = sums.filter(_._1 == minSum).map(_._2).min
      (cell, ids.size.toLong, medoid, minSum)
    }.toSet
    val got = SparkEntry.queries("q237_cell_medoids")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("n_cell"),
        r.getAs[Long]("medoid_id"), r.getAs[Long]("sum_d2"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty)
  }

  // ---- q238 ---------------------------------------------------------
  test("q238: per-lang sums == the JVM brute corpus-wide max-LCP (signature counting is exact)") {
    // brute ALL-PAIRS true-string LCP — independent of the query's 44-bit
    // prefix signatures, so this also certifies collision-freedom on the
    // gate data (a signature collision would falsely raise a best)
    def lcp(a: Array[String], b: Array[String]): Int = {
      var i = 0
      while (i < a.length && i < b.length && a(i) == b(i)) i += 1
      i
    }
    val rows = docRows.map { case (id, lang, _, _) =>
      (id, lang, toks(id))
    }
    val best = rows.map { case (id, lang, tk) =>
      val others = rows.filter(_._1 != id)
      val b = if (others.isEmpty) 0 else others.map(o => lcp(tk, o._3)).max
      (lang, tk.length.toLong, b.toLong)
    }
    val expected = best.groupBy(_._1).map { case (lang, xs) =>
      val tot = xs.map(_._2).sum
      val cac = xs.map(_._3).sum
      (lang, xs.size.toLong, tot, cac, cac.toDouble / tot)
    }.toSet
    val got = SparkEntry.queries("q238_prefix_cache")(spark, sf01).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_toks"), r.getAs[Long]("cacheable_toks"),
        r.getAs[Double]("hit_rate"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.exists(_._4 > 0), "zero cacheable tokens — the audit is vacuous")
  }

  test("q238: duplicate-text and singleton edges — full-length LCP for twins, true 1-token LCP across langs") {
    // identical token arrays must count their FULL length (the class the
    // old zip_with form got wrong at sf0.1), and the corpus-wide form
    // must see 1-token prefixes the old first-2-token bucketing hid
    import spark.implicits._
    val rows = Seq(
      (1L, "en", "a b c d"), (2L, "en", "a b c d"), // exact duplicates
      (3L, "en", "a b x y"), // shares 2 tokens with the twins
      (4L, "de", "z z z"),   // shares 1 token with doc 5 (old form: 0)
      (5L, "de", "z q")
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.Round12c.prefixCacheStats(rows).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("total_toks"), r.getAs[Long]("cacheable_toks"))).toMap
    // en: docs 1/2 cache all 4 tokens each (identical), doc 3 caches 2
    assert(got("en") == ((12L, 10L)), s"en: ${got("en")}")
    // de: docs 4/5 share exactly the 1-token prefix 'z'
    assert(got("de") == ((5L, 2L)), s"de: ${got("de")}")
  }

  // ---- q239 ---------------------------------------------------------
  test("q239: DSIR log-weights == the JVM bigram-LM replay; weights separate target from rest") {
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    def r4(x: Double): JBD = new JBD(x, MathContext.UNLIMITED)
      .setScale(4, RoundingMode.HALF_UP)
    val feats = docRows.map { case (id, lang, _, _) =>
      val tk = toks(id)
      (id, lang,
        if (tk.length < 2) Seq.empty[String]
        else tk.sliding(2).map(_.mkString(" ")).toSeq)
    }.filter(_._3.nonEmpty)
    val cntR = feats.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cntT = feats.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (totR, totT, nf) = (cntR.values.sum, cntT.values.sum, cntR.size.toLong)
    val wF: Map[String, JBD] = cntR.map { case (f, cr) =>
      f -> r4(math.log((cntT.getOrElse(f, 0L) + 1).toDouble / (totT + nf)))
        .subtract(r4(math.log((cr + 1).toDouble / (totR + nf))))
    }
    val byDoc = feats.map { case (id, lang, fs) =>
      val logw = fs.foldLeft(JBD.ZERO)((acc, f) => acc.add(wF(f)))
      (id, lang, fs.size.toLong, logw.doubleValue)
    }
    val ranks = byDoc.groupBy(_._2).flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._4, x._1)).zipWithIndex
        .map { case (x, i) => x._1 -> (i + 1).toLong }
    }
    val expected = byDoc.map { case (id, lang, n, w) => (id, lang, n, w, ranks(id)) }.toSet
    val got = SparkEntry.queries("q239_dsir_weights")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_feats"), r.getAs[Double]("logw"),
        r.getAs[Long]("keep_rank"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the weights are not vacuous: the target slice scores higher on
    // average than the rest (it IS the target model's own data)
    val en = byDoc.filter(_._2 == "en").map(_._4)
    val rest = byDoc.filter(_._2 != "en").map(_._4)
    assert(en.sum / en.size > rest.sum / rest.size,
      "target docs do not outscore the rest — the weighting is inverted or vacuous")
  }

  // ---- q240 ---------------------------------------------------------
  test("q240: NDCG == the JVM graded replay; the 1-bit quantizer's ranking loss is real") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = Tables.embeddings(spark, sf01).select("vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    val grid = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong) }
    def word(v: Array[Float], lo: Int): Long =
      (0 until 32).map(i => if (v(lo + i) > 0) 1L << i else 0L).sum
    val codes = rows.map { case (id, v) => id -> (word(v, 0), word(v, 32)) }
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1).toLong +
        java.lang.Long.bitCount(a._2 ^ b._2).toLong
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 64).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def disc(r: Int): JBD = new JBD(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(4, RoundingMode.HALF_UP)
    val expected = (0L until 10L).map { qid =>
      val h5 = codes.view.filterKeys(_ != qid).toSeq
        .map { case (v, c) => (ham(c, codes(qid)), v) }.sorted.take(5)
        .zipWithIndex.map { case ((_, v), i) => (v, i + 1) }
      val e5 = grid.view.filterKeys(_ != qid).toSeq
        .map { case (v, g) => (d2(g, grid(qid)), v) }.sorted.take(5)
        .zipWithIndex.map { case ((_, v), i) => v -> (i + 1) }.toMap
      val dcg = h5.foldLeft(JBD.ZERO) { case (acc, (v, ar)) =>
        acc.add(disc(ar).multiply(new JBD(e5.get(v).map(6 - _).getOrElse(0)))) }
      val idcg = e5.values.foldLeft(JBD.ZERO)((acc, er) =>
        acc.add(disc(er).multiply(new JBD(6 - er))))
      val hits = h5.count { case (v, _) => e5.contains(v) }.toLong
      (qid, hits, dcg.doubleValue, idcg.doubleValue,
        dcg.doubleValue / idcg.doubleValue)
    }.toSet
    val got = SparkEntry.queries("q240_ndcg_audit")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("hits"),
        r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
        r.getAs[Double]("ndcg"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.exists(_._5 < 1.0),
      "NDCG loss vanished — the audit would be vacuous on this corpus")
  }

  // ---- q241 ---------------------------------------------------------
  test("q241: digest diff == the JVM order-invariant checksum replay; clean buckets stay silent") {
    val li = Tables.lineitem(spark, sf01)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey"),
        r.getAs[Long]("l_suppkey"), r.getAs[Int]("l_linenumber"),
        r.getAs[Double]("l_quantity"), r.getAs[Double]("l_extendedprice")))
    def h(ok: Long, pk: Long, sk: Long, ln: Int, q: Double, ep: Double): Long = {
      val canon = s"$ok|$pk|$sk|$ln|${math.floor(q * 100).toLong}|${math.floor(ep * 100).toLong}"
      java.lang.Long.parseLong(md5hex(canon).substring(0, 15), 16)
    }
    def digest(rows: Seq[(Long, Long, Long, Int, Double, Double)]) =
      rows.groupBy(_._1 % 64).view.mapValues { g =>
        val hs = g.map { case (ok, pk, sk, ln, q, ep) => h(ok, pk, sk, ln, q, ep) }
        (g.size.toLong, hs.foldLeft(0L)(_ ^ _), hs.map(_ % 1048576L).sum)
      }.toMap
    val da = digest(li.toSeq)
    val db = digest(li.toSeq.filter(_._1 % 997 != 29)
      .map { case (ok, pk, sk, ln, q, ep) =>
        (ok, pk, sk, ln, if (ok % 997 == 13) q + 1.0 else q, ep) })
    // total over one-sided buckets (da.get/db.get, not da(b)): with the
    // current %997 plant every bucket survives in both snapshots, but the
    // query's diff is null-safe and this builder must not throw if the
    // testdata regen ever makes a bucket one-sided
    // one-sided buckets stay Option-typed END TO END: getAs[Long] on a null
    // column silently unboxes to 0L, so a scalar sentinel on the expected
    // side would mis-compare the day a testdata regen actually produces a
    // one-sided bucket (the query itself is null-safe)
    val expected = (da.keySet ++ db.keySet).toSeq
      .filter(b => da.get(b) != db.get(b))
      .map(b => (b, da.get(b), db.get(b)))
      .toSet
    def side(r: org.apache.spark.sql.Row, c1: String, c2: String,
             c3: String): Option[(Long, Long, Long)] =
      Option(r.getAs[java.lang.Long](c1)).map(v => (v.longValue,
        r.getAs[java.lang.Long](c2).longValue,
        r.getAs[java.lang.Long](c3).longValue))
    val got = SparkEntry.queries("q241_dataset_digest")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("bucket"),
        side(r, "rows_a", "xr_a", "hs_a"),
        side(r, "rows_b", "xr_b", "hs_b"))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the audit is selective, not a tautology: some buckets are clean
    assert(expected.size < 64 && expected.nonEmpty,
      s"${expected.size} of 64 buckets flagged — plant or digest is degenerate")
  }

  // ---- q242 ---------------------------------------------------------
  test("q242: MMR picks == the JVM greedy replay, score-exact") {
    val grid: Map[Long, Array[Double]] =
      Tables.embeddings(spark, sf01).select("vec_id", "embedding").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[Seq[Float]]("embedding")
            .map(x => math.floor(x.toDouble * 1e6)).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    val q = grid(0L)
    val cand = grid.filter { case (id, _) => id > 0 && id < 200 }
      .map { case (id, v) => id -> (cos(v, q), v) }
    var selected = Vector.empty[Long]
    var expected = Vector.empty[(Int, Long, Double, Double, Double)]
    for (k <- 1 to 3) {
      val scored = cand.filterNot { case (id, _) => selected.contains(id) }
        .map { case (id, (rel, v)) =>
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.map(s => cos(v, cand(s)._2)).max
          (id, rel, maxSim, 0.5 * rel - 0.5 * maxSim)
        }
      val (id, rel, ms, sc) = scored.minBy { case (i, _, _, s) => (-s, i) }
      selected :+= id
      expected :+= ((k, id, rel, ms, sc))
    }
    val got = SparkEntry.queries("q242_mmr_select")(spark, sf01).collect()
      .map(r => (r.getAs[Int]("sel_rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("rel"), r.getAs[Double]("max_sim"),
        r.getAs[Double]("score"))).toVector
    assert(got == expected, s"got=$got expected=$expected")
    // diversity is live: later picks carry a real computed similarity
    // term (on this noise corpus it can be NEGATIVE — anti-correlated
    // picks — but never the round-1 placeholder 0.0)
    assert(expected.drop(1).forall(_._4 != 0.0), "max_sim never fired")
  }
}

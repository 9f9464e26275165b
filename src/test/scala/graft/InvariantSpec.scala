package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the declared queries (SURVEY.md §5.3), checked
  * on real sf0.001 data — cheap, deterministic, and independent of the
  * DuckDB oracle (they catch bugs the hash compare can't explain).
  */
class InvariantSpec extends AnyFunSuite {
  import SharedSpark.{sf001, spark}

  private def run(q: String) = SparkEntry.queries(q)(spark, sf001)

  test("q34 dedup output has unique (user_id, event_type) and is idempotent in size") {
    val out = run("q34_dedup").cache()
    val n = out.count()
    assert(out.select("user_id", "event_type").distinct().count() == n)
    // every kept row is the group's minimum (ts, event_id)
    val ev = graft.Tables.events(spark, sf001)
    val mins = ev.groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"), col("m.event_id").as("event_id"))
    assert(out.join(mins, Seq("user_id", "event_type", "event_id")).count() == n)
    out.unpersist()
  }

  test("q37 late counts are non-negative and totals cover all events") {
    val rows = run("q37_late_events").collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2)))
    val total = rows.map(_.getLong(2)).sum
    assert(total == graft.Tables.events(spark, sf001).count())
    // the simulated arrival permutation must actually produce late events
    assert(rows.map(_.getLong(1)).sum > 0, "q37 is vacuous — no late events")
  }

  test("q40 jaccard similarities are in [0.5, 1] with doc_a < doc_b") {
    val rows = run("q40_near_dup_jaccard").collect()
    rows.foreach { r =>
      val (a, b, sim) = (r.getLong(0), r.getLong(1), r.getDouble(5))
      assert(a < b)
      assert(sim >= 0.5 && sim <= 1.0)
    }
  }

  test("q41 cosine similarities are in [-1, 1], ranks 1..5, no self-pairs") {
    val rows = run("q41_cosine_topk").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1))
      val c = r.getDouble(2)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 5)
    }
  }

  test("q33 session starts: per-user session counts match a gap-count check") {
    import spark.implicits._
    val sessions = run("q33_session_window")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val ev = graft.Tables.events(spark, sf001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull, 1)
          .when(unix_millis(col("ts")) - unix_millis(col("prev_ts")) >= 30L * 60 * 1000, 1)
          .otherwise(0)
      )
      .groupBy("user_id").agg(sum("new_session").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sessions == gaps)
  }

  test("q17 union-all count = |A| + |B|; union-distinct has no duplicates") {
    val out = run("q17_union").cache()
    val ev = graft.Tables.events(spark, sf001)
    val na = ev.where(col("event_type").isin("click", "purchase")).count()
    val nb = ev.where(col("value") >= 150.0).count()
    assert(out.where(col("src") === "all").count() == na + nb)
    val dist = out.where(col("src") === "dist")
    assert(dist.count() == dist.distinct().count())
    out.unpersist()
  }

  test("q54 approximate sketches bound their exact counterparts") {
    val approx = run("q54_approx_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = graft.Tables.lineitem(spark, sf001)
    val exact = li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m")
      )
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (ad, am)) =>
      val (ed, em) = exact(k)
      assert(math.abs(ad - ed).toDouble / ed < 0.05, s"$k HLL off >5%: $ad vs $ed")
      assert(math.abs(am - em) / em < 0.10, s"$k approx median off >10%: $am vs $em")
    }
  }

  test("q42 predicted labels are valid and one per query vector") {
    val rows = run("q42_knn_classify").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).distinct.length == 20)
    rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) <= 9))
  }

  test("round-6 analytics invariants: funnel monotone, retention bounded, gap-fill dense, drift in [0,2]") {
    // q85: each funnel stage can only shrink, rates in (0, 1]
    val f = run("q85_funnel").collect()(0)
    val (nv, nc, np) = (f.getLong(0), f.getLong(1), f.getLong(2))
    assert(nv >= nc && nc >= np && np >= 0, s"funnel not monotone: $nv $nc $np")
    assert(f.getDouble(3) > 0 && f.getDouble(3) <= 1.0)
    // q87: retention in (0, 1]; every cohort's offset-0 cell is exactly 1.0
    val ret = run("q87_cohort_retention").collect()
    assert(ret.nonEmpty)
    ret.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, s"retention out of range: $r")
      if (r.getInt(1) == 0) assert(r.getDouble(3) == 1.0, s"week-0 must be 1.0: $r")
    }
    // q86: the grid is dense per user (rows == span hours) and v_fill is
    // never null (the first grid hour is an observed hour by construction)
    val gf = run("q86_gap_fill")
    assert(gf.where(col("v_fill").isNull).isEmpty, "forward fill left a hole")
    val spans = gf.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((unix_seconds(max(col("hr"))) - unix_seconds(min(col("hr")))) / 3600 + 1).as("want"))
      .where(col("n") =!= col("want"))
    assert(spans.isEmpty, s"grid not dense: ${spans.collect().mkString(",")}")
    // q90: L1 distance between distributions lives in [0, 2]
    val l1 = run("q90_corpus_drift").collect()(0).getDouble(3)
    assert(l1 >= 0.0 && l1 <= 2.0, s"L1 out of range: $l1")
  }

  test("round-7 invariants: map explode covers keys, sketch drift samples q90's space, z-scores exceed 3, SCD2 intervals tile") {
    // q91: every (event_type, key) group count is positive and the key
    // multiset equals a direct json probe of the raw table
    val m = run("q91_map_explode").collect()
    assert(m.nonEmpty && m.forall(_.getLong(2) > 0))
    val nEvents = graft.Tables.events(spark, sf001)
      .where(get_json_object(col("props"), "$.k").isNotNull).count()
    assert(m.map(_.getLong(2)).sum == nEvents,
      "exploded (type,key) counts must cover every event with a parsed key")
    // q92: the sampled drift tracks a SUBSET of q90's token space with
    // consistent totals (sampled occurrences <= full occurrences)
    val full = run("q90_corpus_drift").collect()(0)
    val sk = run("q92_sketch_drift").collect()(0)
    assert(sk.getLong(0) <= full.getLong(0), "sampled type count exceeds full vocab")
    assert(sk.getLong(1) <= full.getLong(1) && sk.getLong(2) <= full.getLong(2))
    assert(sk.getDouble(3) >= 0.0 && sk.getDouble(3) <= 2.0)
    // q93: every flagged row is beyond 3 sigma, and no flagged event is
    // within the bulk (|z| values are finite, not NaN)
    val z = run("q93_anomaly_zscore").collect()
    assert(z.nonEmpty && z.forall(r => math.abs(r.getDouble(3)) > 3.0
      && !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // q94: per user the intervals TILE — exactly one current row (null
    // valid_to), and each row's valid_to equals the next valid_from in
    // (valid_from, status) order, so the history has no gap and no overlap
    val scd = run("q94_scd2_intervals").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(scd.nonEmpty)
    scd.groupBy(_._1).foreach { case (user, rows) =>
      assert(rows.count(_._3.isEmpty) == 1, s"user $user: not exactly one current row")
      assert(rows.forall(r => r._3.isEmpty == r._4), s"user $user: is_current != (valid_to IS NULL)")
      val sorted = rows.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $user: interval [${a._2}, ${a._3}) does not abut ${b._2}")
        case _ =>
      }
    }
  }

  test("round-7 mining invariants: q95/q97/q98/q99 match in-memory recomputation, q96 rows normalize") {
    // shared collected events: (user_id, ts_micros, event_id, event_type, date)
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), to_date(col("ts")).cast("string").as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val byUser = ev.groupBy(_._1)

    // q95: brute-force triangle enumeration over (ts, event_id)-sorted nodes
    val W = 21600000000L
    val expTri = byUser.flatMap { case (u, rows) =>
      val nodes = rows.map(r => (r._2, r._3)).sortBy(identity)
      var cnt = 0L
      val n = nodes.length
      for (i <- 0 until n; j <- i + 1 until n if nodes(j)._1 - nodes(i)._1 <= W;
           k <- j + 1 until n if nodes(k)._1 - nodes(i)._1 <= W)
        cnt += 1
      if (cnt > 0) Some(u -> cnt) else None
    }
    val gotTri = run("q95_triangle_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotTri == expTri, "q95 triangle counts differ from brute force")

    // q96: per-source probabilities sum to 1; transitions total Σ(n_u - 1)
    val tr = run("q96_event_transitions").collect()
    tr.groupBy(_.getString(0)).foreach { case (ft, rows) =>
      val p = rows.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-9, s"q96 $ft: probabilities sum to $p")
    }
    assert(tr.map(_.getLong(2)).sum ==
      byUser.valuesIterator.map(_.length.toLong - 1).sum)

    // q97: exact match against an all-pairs in-memory blocked levenshtein
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val cust = graft.Tables.customer(spark, sf001)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    val expPairs = (for {
      a <- cust; b <- cust
      if a._1 < b._1 && a._3 == b._3 && a._4 == b._4
      dist = lev(a._2, b._2).toLong if dist <= 2
    } yield (a._1, b._1, dist)).sorted.toList
    val gotPairs = run("q97_fuzzy_linkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(gotPairs == expPairs, s"q97: ${gotPairs.size} pairs vs expected ${expPairs.size}")

    // q98: full index recomputation (df, total_tf, top-10 champion list)
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, text) => text.split(" ").map(t => (t, id)) }
      .groupBy(identity).map { case ((t, id), xs) => ((t, id), xs.length.toLong) }
    val expIdx = tf.groupBy(_._1._1).map { case (term, m) =>
      val post = m.map { case ((_, id), f) => (id, f) }.toList
      term -> (post.size.toLong, post.map(_._2).sum,
        post.sortBy { case (id, f) => (-f, id) }.take(10).map(_._1).mkString(","))
    }
    val gotIdx = run("q98_inverted_index").collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))
    }.toMap
    assert(gotIdx == expIdx, "q98 inverted index differs from recomputation")

    // q99: full recomputation incl. bit-identical support/lift arithmetic
    val baskets = ev.map(r => (r._1, r._5, r._4)).distinct
    val nBask = baskets.map(t => (t._1, t._2)).distinct.length.toLong
    val nSingle = baskets.groupBy(_._3).map { case (t, xs) => t -> xs.length.toLong }
    val expCo = baskets.groupBy(t => (t._1, t._2)).valuesIterator
      .flatMap { rows =>
        val ts = rows.map(_._3).distinct.sorted
        for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
      }
      .toList.groupBy(identity).map { case ((ta, tb), xs) =>
        val nAb = xs.length.toLong
        val (nA, nB) = (nSingle(ta), nSingle(tb))
        (ta, tb, nAb, nA, nB, nAb.toDouble / nBask.toDouble,
          (nAb * nBask).toDouble / (nA * nB).toDouble)
      }.toList.sortBy(t => (t._1, t._2))
    val gotCo = run("q99_cooccur_lift").collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))
    }.toList
    assert(gotCo == expCo, "q99 co-occurrence/lift differs from recomputation")

    // q100: rolling-hour RANGE frame matches a direct per-user scan
    // (counts exact; sums recomputed in the same scale-4 decimal space)
    val evVal = graft.Tables.events(spark, sf001)
      .select(col("user_id"), expr("unix_micros(ts) DIV 1000000").as("sec"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expRoll = evVal.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      rows.iterator.map { r =>
        val in = rows.filter(x => x._2 >= r._2 - 3599 && x._2 <= r._2)
        val sum = in.map(x => BigDecimal(x._4).setScale(4)).sum
        (u, r._3) -> ((in.length.toLong, sum.toDouble))
      }
    }.toMap
    val gotRoll = run("q100_rolling_window").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(gotRoll == expRoll, "q100 rolling window differs from direct scan")
  }

  test("round-7b invariants: q101 prefix filter loses nothing, q102/q103 match " +
    "recomputation, q104 depths follow the heap closed form") {
    // q101: the prefix-filtered join must equal brute-force all-pairs
    // Jaccard >= 0.9 on the same carve — exactness is the whole claim
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
      .where(col("doc_id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
    val expPf = (for {
      a <- docs; b <- docs if a._1 < b._1
      nc = (a._2 & b._2).size.toLong
      ja = nc.toDouble / (a._2.size + b._2.size - nc)
      if ja >= 0.9
    } yield (a._1, b._1, a._2.size.toLong, b._2.size.toLong, nc, ja))
      .sortBy(t => (t._1, t._2)).toList
    val gotPf = run("q101_prefix_filter_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toList
    assert(gotPf == expPf, s"q101: ${gotPf.size} pairs vs brute-force ${expPf.size}")

    // q102: rolling 7-day distinct/total from a direct in-memory scan
    val du = graft.Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("d"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val expWin = du.flatMap { case (u, day) =>
      (0 to 6).map(k => (day.plusDays(k), u))
    }.groupBy(_._1).map { case (wend, xs) =>
      wend.toString -> ((xs.map(_._2).distinct.length.toLong, xs.length.toLong))
    }
    val gotWin = run("q102_rolling_distinct").collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotWin == expWin, "q102 rolling distinct differs from direct scan")

    // q103: 3 scaled-integer PageRank iterations recomputed from the
    // collected trade graph — every DIV truncation must line up
    val prDf = run("q103_pagerank") // output checked below; rebuild edges here
    val edges = graft.Tables.lineitem(spark, sf001).select("l_orderkey", "l_suppkey")
      .join(graft.Tables.orders(spark, sf001).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, sf001).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.supplier(spark, sf001).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val wout = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val nodes = graft.Tables.nation(spark, sf001).select("n_nationkey")
      .collect().map(_.getInt(0)).sorted
    var rank = nodes.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to 3) {
      val cin = edges.groupBy(_._2).map { case (dst, xs) =>
        dst -> xs.map { case (s, _, w) => (rank(s) * w) / wout(s) }.sum
      }
      rank = nodes.map(n => n -> (150000000000L + (85 * cin.getOrElse(n, 0L)) / 100)).toMap
    }
    val gotPr = prDf.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotPr == rank, "q103 pagerank differs from scaled-integer recomputation")
    // rank mass: teleport floor holds and total mass never exceeds initial
    assert(gotPr.values.forall(_ >= 150000000000L))
    assert(gotPr.values.sum <= nodes.length * 1000000000000L)

    // q104: depth of heap node ck is floor(log2(ck+1)); counts and balance
    // sums per level from the raw table
    val cust = graft.Tables.customer(spark, sf001).select("c_custkey", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expLv = cust.groupBy { case (ck, _) => 63 - java.lang.Long.numberOfLeadingZeros(ck + 1) }
      .map { case (depth, xs) =>
        depth -> ((xs.length.toLong,
          xs.map(x => BigDecimal(x._2).setScale(4)).sum.toDouble))
      }
    val gotLv = run("q104_recursive_hierarchy").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotLv == expLv, "q104 recursive traversal differs from the closed form")
  }

  test("round-7c invariants: q105 sweep equals brute-force dominance, q106 islands, " +
    "q107 systematic picks, q108 fk counts all match direct recomputation") {
    // q105: the order-sweep skyline must equal the quadratic definition
    val parts = graft.Tables.part(spark, sf001)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expSky = parts.filter { p =>
      !parts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.sortBy(_._1).toList
    val gotSky = run("q105_skyline").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toList
    assert(gotSky == expSky, s"q105: ${gotSky.size} rows vs brute-force ${expSky.size}")
    assert(gotSky.nonEmpty)

    // q106: merge intervals directly per user and compare count + coverage
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), expr("unix_micros(ts) DIV 1000000").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expIsl = ev.groupBy(_._1).map { case (u, xs) =>
      val secs = xs.map(_._2).sorted
      var n = 0L; var covered = 0L
      var st = -1L; var en = -1L
      for (sc <- secs) {
        if (st < 0 || sc > en) {
          if (st >= 0) covered += en - st
          n += 1; st = sc; en = sc + 1800
        } else en = math.max(en, sc + 1800)
      }
      if (st >= 0) covered += en - st
      u -> ((n, covered))
    }
    val gotIsl = run("q106_interval_union").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotIsl == expIsl, "q106 interval union differs from direct merge")

    // q107: recompute the systematic sample directly — sort by the
    // permutation, prefix-sum token counts, keep boundary-crossing spans
    val docs7 = graft.Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
    val ordered = docs7.map { case (id, n) => (id * 7919 % 104729, id, n) }
      .sortBy(t => (t._1, t._2))
    var off = 0L
    val expPick = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    for ((_, id, n) <- ordered) {
      if ((off + n) / 512 > off / 512) expPick += ((id, n, off))
      off += n
    }
    val gotPick = run("q107_systematic_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(gotPick == expPick.toList.sortBy(_._1),
      s"q107: ${gotPick.size} picks vs direct ${expPick.size}")
    // systematic property: picks never exceed boundaries, never empty here
    assert(gotPick.nonEmpty && gotPick.size <= (off / 512).toInt + 1)

    // q108: orphan/childless counts from key sets
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(col(c).cast("long")).collect().map(_.getLong(0))
    val (cn, nk) = (keys(graft.Tables.customer(spark, sf001), "c_nationkey"),
      keys(graft.Tables.nation(spark, sf001), "n_nationkey"))
    val (lo, ok) = (keys(graft.Tables.lineitem(spark, sf001), "l_orderkey"),
      keys(graft.Tables.orders(spark, sf001), "o_orderkey"))
    val exp108 = Map(
      "customer->nation" -> ((cn.count(!nk.toSet.contains(_)).toLong,
        nk.count(!cn.toSet.contains(_)).toLong)),
      "lineitem->orders" -> ((lo.count(!ok.toSet.contains(_)).toLong,
        ok.count(!lo.toSet.contains(_)).toLong)))
    val got108 = run("q108_fk_audit").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    exp108.foreach { case (rel, want) =>
      assert(got108(rel) == want, s"q108 $rel: ${got108(rel)} vs $want")
    }
    assert(got108.size == 4)
  }

  test("round-7d invariants: q109 TWA, q110 attribution, q111 least squares, " +
    "q112 digit histogram all match direct replays") {
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), expr("unix_micros(ts) DIV 1000000").as("sec"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val byUser = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.sortBy(x => (x._2, x._3))
    }

    // q109: the step-function integral in the same decimal space
    val expTwa = byUser.collect { case (u, xs) if xs.length > 1 =>
      val segs = xs.sliding(2).map { case Array(a, b) =>
        BigDecimal(a._5).setScale(4) * BigDecimal(b._2 - a._2)
      }.toList
      val span = xs.last._2 - xs.head._2
      u -> ((span, segs.sum.toDouble / span.toDouble))
    }
    val gotTwa = run("q109_time_weighted_avg").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotTwa == expTwa, "q109 TWA differs from the direct step integral")

    // q110: walk each user's stream carrying the last non-purchase type
    val credit = scala.collection.mutable.Map.empty[String, Long]
    var totalPurchases = 0L
    for ((_, xs) <- byUser) {
      var touch: String = null
      for (e <- xs) {
        if (e._4 == "purchase") {
          val ch = if (touch == null) "none" else touch
          credit(ch) = credit.getOrElse(ch, 0L) + 1
          totalPurchases += 1
        } else touch = e._4
      }
    }
    val gotAtt = run("q110_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(gotAtt.map(_._2).sum == totalPurchases)
    gotAtt.foreach { case (ch, n, share) =>
      assert(credit(ch) == n, s"q110 $ch: $n vs ${credit(ch)}")
      assert(share == n.toDouble / totalPurchases.toDouble)
    }
    assert(gotAtt.map(_._1).toSet == credit.keySet)

    // q111: closed-form least squares in the same exact-decimal space,
    // replaying the engines' exact float sequence (two casts, one div,
    // then the intercept chain)
    val expSlope = byUser.collect { case (u, xs)
        if xs.map(_._2).distinct.length > 1 || xs.length > 1 =>
      val n = BigDecimal(xs.length)
      val sx = xs.map(x => BigDecimal(x._2)).sum
      val sy = xs.map(x => BigDecimal(x._5).setScale(4)).sum
      val sxy = xs.map(x => BigDecimal(x._2) * BigDecimal(x._5).setScale(4)).sum
      val sxx = xs.map(x => BigDecimal(x._2) * BigDecimal(x._2)).sum
      val den = n * sxx - sx * sx
      if (den == 0) None else {
        val slope = (n * sxy - sx * sy).toDouble / den.toDouble
        Some(u -> ((slope, (sy.toDouble - slope * sx.toDouble) / n.toDouble)))
      }
    }.flatten.toMap
    val gotSlope = run("q111_trend_slope").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(gotSlope == expSlope, "q111 slope/intercept differ from the closed form")

    // q112: digit histogram from exact cents
    val cents = graft.Tables.orders(spark, sf001)
      .select(col("o_totalprice").cast("decimal(18,2)")).collect()
      .map(r => (r.getDecimal(0).unscaledValue().longValue()))
    val expDig = cents.map(_.toString.charAt(0).asDigit)
      .groupBy(identity).map { case (d0, xs) => d0 -> xs.length.toLong }
    val gotDig = run("q112_benford").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotDig == expDig, "q112 digit histogram differs from exact cents")
  }

  test("round-7e invariants: q113 streaks, q114 peak drops, q115 mode, " +
    "q116 reconciliation all match direct replays") {
    // q113: longest consecutive-day run per user, recomputed by walking
    // each user's sorted distinct epoch-days
    val userDays = graft.Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(_._2).sortBy(_.toEpochDay)
      }
    val expStreak = userDays.map { case (u, days) =>
      var runs = List.empty[(Long, java.time.LocalDate, java.time.LocalDate)]
      var start = days.head
      var prev = days.head
      for (d <- days.tail) {
        if (d.toEpochDay != prev.toEpochDay + 1) {
          runs ::= ((prev.toEpochDay - start.toEpochDay + 1, start, prev))
          start = d
        }
        prev = d
      }
      runs ::= ((prev.toEpochDay - start.toEpochDay + 1, start, prev))
      u -> runs.minBy(r => (-r._1, r._2.toEpochDay))
    }
    val gotStreak = run("q113_streaks").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDate(2).toLocalDate,
        r.getDate(3).toLocalDate))).toMap
    assert(gotStreak == expStreak, "q113 streaks differ from the direct walk")

    // q114: running peak / max drop replayed in the same decimal space
    val evSorted = graft.Tables.events(spark, sf001)
      .select(col("user_id"), expr("unix_micros(ts) DIV 1000000").as("sec"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.sortBy(x => (x._2, x._3)) }
    val expDrop = evSorted.map { case (u, xs) =>
      var peak = BigDecimal(xs.head._4).setScale(4)
      var maxDrop = BigDecimal(0).setScale(4)
      for (e <- xs) {
        val v = BigDecimal(e._4).setScale(4)
        if (v > peak) peak = v
        if (peak - v > maxDrop) maxDrop = peak - v
      }
      u -> ((peak.toDouble, maxDrop.toDouble, xs.length.toLong))
    }
    val gotDrop = run("q114_peak_drop").collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(gotDrop == expDrop, "q114 peak/drop differ from the direct walk")

    // q115: mode with the (n DESC, type ASC) total order, plus share
    val typed = graft.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
    val expMode = typed.map { case (u, xs) =>
      val counts = xs.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong }
      val (t, n) = counts.toList.minBy { case (ty, c) => (-c, ty) }
      u -> ((t, n, n.toDouble / xs.length.toDouble))
    }
    val gotMode = run("q115_mode").collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotMode == expMode, "q115 mode differs from the direct count")

    // q116: recompute every order total in exact BigDecimal space and
    // roll up per status; decimal outputs must match to the last digit
    val li = graft.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val perOrder = li.groupBy(_._1).map { case (ok, xs) =>
      ok -> xs.map { case (_, ep, disc, tax) =>
        BigDecimal(ep).setScale(2) *
          (BigDecimal(1).setScale(4) - BigDecimal(disc).setScale(4)) *
          (BigDecimal(1).setScale(4) + BigDecimal(tax).setScale(4))
      }.sum.setScale(10)
    }
    val ord = graft.Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expRec = ord.groupBy(_._2).map { case (st, xs) =>
      val withItems = xs.flatMap(o => perOrder.get(o._1).map(o -> _))
      val exact = withItems.count { case (o, rc) =>
        BigDecimal(o._3).setScale(2) == rc
      }
      val maxDiff =
        if (withItems.isEmpty) null
        else withItems.map { case (o, rc) =>
          (BigDecimal(o._3).setScale(2) - rc).abs
        }.max.setScale(10)
      (st, xs.length.toLong, withItems.length.toLong, exact.toLong, maxDiff)
    }.toSet
    val gotRec = run("q116_reconcile").collect().map { r =>
      // max_abs_diff is a STRING now (harness-safe wide decimal)
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(6)) null else BigDecimal(r.getString(6)).setScale(10))
    }.toSet
    assert(gotRec == expRec, "q116 reconciliation differs from the replay")
  }

  test("q116 wide-decimal strings stay PLAIN notation at every magnitude " +
    "(Spark's decimal→string cast matches DuckDB's always-plain VARCHAR)") {
    import spark.implicits._
    // q116 emits its wide decimals as strings; portability needs Spark's
    // rendering to be plain notation at EVERY magnitude — including the
    // adjusted-exponent < -6 range (a fully-reconciled group's
    // max_abs_diff of 0, any diff below 1e-6) where java
    // BigDecimal.toString goes scientific ("0E-10") but DuckDB stays
    // plain ("0.0000000000"). Spark 4.1.2's cast was probed plain there
    // (round 9); this test locks the property so a Spark upgrade that
    // regresses to BigDecimal.toString semantics fails by name, not as a
    // driver hash mismatch on regenerated data.
    val cases = Seq(
      "0", "0.0000000001", "-0.0000000001", "0.0000001", "-0.0000001",
      "0.000001", "0.5", "-0.5", "123.45", "-123.45",
      "123456789012345678.0123456789", "-123456789012345678.0123456789")
    val rows = cases.toDF("s").select(
      col("s"),
      col("s").cast("decimal(28,10)").cast("string").as("native"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { s =>
      val expected = new java.math.BigDecimal(s).setScale(10).toPlainString
      assert(rows(s) == expected,
        s"decimal(28,10)→string of $s rendered '${rows(s)}', want plain " +
          s"'$expected' — Spark's cast no longer matches DuckDB's VARCHAR " +
          "rendering; q116 needs an explicit plain-notation formatter")
    }
    // sanity on the fixture: BigDecimal.toString really is scientific in
    // that range (the divergence this test exists to guard)
    assert(new java.math.BigDecimal("0").setScale(10).toString == "0E-10")
    // and the declared query's live output must never contain an exponent
    run("q116_reconcile").collect().foreach { r =>
      Seq(5, 6).foreach { i =>
        if (!r.isNullAt(i))
          assert(!r.getString(i).contains("E"),
            s"q116 column $i rendered scientific: ${r.getString(i)}")
      }
    }
  }

  test("round-7f invariants: q117 winsorized caps, q118 MAD, q119 degree " +
    "histogram all match direct replays") {
    val ev = graft.Tables.events(spark, sf001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)

    // q117: position-based caps and the clamped decimal mean
    val expWin = ev.map { case (t, xs) =>
      val sorted = xs.map(x => (BigDecimal(x._3).setScale(4), x._2)).sortBy(identity)
      val n = sorted.length
      val lo = sorted((n + 19) / 20 - 1)._1
      val hi = sorted((19 * n + 19) / 20 - 1)._1
      val csum = sorted.map(_._1).map(v => v.max(lo).min(hi)).sum
      t -> ((n.toLong, lo.toDouble, hi.toDouble, csum.toDouble / n.toDouble))
    }
    val gotWin = run("q117_winsorized").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(gotWin == expWin, "q117 winsorized mean differs from the replay")
    gotWin.foreach { case (t, (_, lo, hi, wm)) =>
      assert(lo <= wm && wm <= hi, s"q117 $t: wmean outside [lo, hi]")
    }

    // q118: lower-median and MAD by position
    val expMad = ev.map { case (t, xs) =>
      val sorted = xs.map(x => (BigDecimal(x._3).setScale(4), x._2)).sortBy(identity)
      val n = sorted.length
      val med = sorted((n + 1) / 2 - 1)._1
      val ads = xs.map(x => ((BigDecimal(x._3).setScale(4) - med).abs, x._2))
        .sortBy(identity)
      t -> ((n.toLong, med.toDouble, ads((n + 1) / 2 - 1)._1.toDouble))
    }
    val gotMad = run("q118_mad").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(gotMad == expMad, "q118 MAD differs from the replay")

    // q119: degrees cover every customer exactly once and sum to |orders|
    val got = run("q119_degree_hist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nCust = graft.Tables.customer(spark, sf001).count()
    val nOrd = graft.Tables.orders(spark, sf001).count()
    assert(got.map(_._2).sum == nCust, "q119 histogram misses customers")
    assert(got.map(x => x._1 * x._2).sum == nOrd,
      "q119 degree-weighted sum != |orders|")
    got.foreach { case (_, n, share) =>
      assert(share == n.toDouble / nCust.toDouble)
    }
  }

  test("round-7g invariants: q120 gini rank-sum and q121 weighted median " +
    "match direct replays") {
    // q120: recompute the rank-sum identity in BigDecimal
    val ev = graft.Tables.events(spark, sf001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expGini = ev.map { case (t, xs) =>
      val sorted = xs.map(x => (BigDecimal(x._3).setScale(4), x._2)).sortBy(identity)
      val n = sorted.length
      val num = sorted.zipWithIndex
        .map { case ((v, _), i) => BigDecimal(2 * (i + 1) - n - 1) * v }.sum
      val den = BigDecimal(n) * sorted.map(_._1).sum
      t -> ((n.toLong, num.toDouble / den.toDouble))
    }
    val gotGini = run("q120_gini").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotGini == expGini, "q120 gini differs from the rank-sum replay")
    gotGini.foreach { case (t, (_, g)) =>
      assert(g >= 0.0 && g < 1.0, s"q120 $t: gini $g outside [0, 1)")
    }

    // q121: cumulative-weight crossing on the grouped (flag, price) table
    val li = graft.Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(4),
        r.getDouble(2).toLong))
      .groupBy(_._1)
    val expWm = li.map { case (f, xs) =>
      val byPrice = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toVector.sortBy(_._1)
      val tw = byPrice.map(_._2).sum
      var cw = 0L
      val med = byPrice.find { case (_, w) => cw += w; cw * 2 >= tw }.get._1
      f -> ((tw, med.toDouble))
    }
    val gotWm = run("q121_weighted_median").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotWm == expWm, "q121 weighted median differs from the replay")
  }

  test("round-8 invariants: q122 CMS bounds, q123 lateral top-3, q124 bag " +
    "arithmetic all match direct replays") {
    // q122: est >= exact (structural CMS guarantee) and est matches an
    // in-memory sketch replay with the same hash family
    val users = graft.Tables.events(spark, sf001).select("user_id").collect()
      .map(_.getLong(0))
    val P = 104729L
    val counters = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (u <- users; i <- 0L until 4L) {
      val b = ((4 * i + 3) * u + 7 * i + 5) % P % 256
      counters((i, b)) = counters.getOrElse((i, b), 0L) + 1L
    }
    val exact = users.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cms = run("q122_cms_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cms.nonEmpty, "q122 probe carve is vacuous at sf0.001")
    cms.foreach { case (u, ex, est, over) =>
      assert(u % 97 == 0 && ex == exact(u) && over == est - ex)
      assert(est >= ex, s"q122 CMS underestimated user $u: $est < $ex")
      val expEst = (0L until 4L)
        .map(i => counters((i, ((4 * i + 3) * u + 7 * i + 5) % P % 256))).min
      assert(est == expEst, s"q122 estimate for $u differs from sketch replay")
    }

    // q123: per-nation rows are exactly the window top-3 of the replay
    val cust = graft.Tables.customer(spark, sf001)
      .join(graft.Tables.nation(spark, sf001),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expTop = cust.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, ck, bal) => (-bal, ck) }.take(3).map(t => (t._2, t._3)).toList
    ).toMap
    val gotTop = run("q123_lateral_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toList).toMap
    assert(gotTop == expTop, "q123 lateral top-3 differs from the window replay")

    // q124: per-key bag arithmetic — except = max(0, |a| - |b|),
    // intersect = min(|a|, |b|) — on the same carve projections
    val li = graft.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag").collect()
      .map(r => (r.getLong(0) % 97, r.getLong(1) % 89, r.getInt(2), r.getString(3)))
    val bagA = li.filter(_._3 % 2 == 0).groupBy(t => (t._1, t._2)).view
      .mapValues(_.length.toLong).toMap
    val bagB = li.filter(_._4 == "R").groupBy(t => (t._1, t._2)).view
      .mapValues(_.length.toLong).toMap
    val expEx = (for ((k, na) <- bagA; n = na - bagB.getOrElse(k, 0L) if n > 0)
      yield ("except_all", k._1, k._2, n)).toSet
    val expIn = (for ((k, na) <- bagA; n = math.min(na, bagB.getOrElse(k, 0L)) if n > 0)
      yield ("intersect_all", k._1, k._2, n)).toSet
    val gotBag = run("q124_except_intersect_all").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotBag == expEx ++ expIn, "q124 bag arithmetic differs from the replay")

    // q125: lag-1 autocorrelation replayed with the same exact-sum/IEEE
    // sequence; values must be in [-1, 1]
    val hourly = graft.Tables.events(spark, sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1)
    val expAc = hourly.flatMap { case (t, xs) =>
      val series = xs.sortBy(_._2).map(_._3)
      val pairs = series.zip(series.drop(1))
      val n = BigDecimal(pairs.length)
      val (sx, sy) = (BigDecimal(pairs.map(_._1).sum), BigDecimal(pairs.map(_._2).sum))
      val sxy = BigDecimal(pairs.map(p => p._1 * p._2).sum)
      val sxx = BigDecimal(pairs.map(p => p._1 * p._1).sum)
      val syy = BigDecimal(pairs.map(p => p._2 * p._2).sum)
      if (n * sxx == sx * sx || n * syy == sy * sy) None
      else Some(t -> ((pairs.length.toLong,
        (n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) *
            math.sqrt((n * syy - sy * sy).toDouble)))))
    }
    val gotAc = run("q125_autocorr").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotAc == expAc, "q125 autocorrelation differs from the replay")
    assert(gotAc.values.forall { case (_, a) => a >= -1.0 && a <= 1.0 })
  }

  test("q127 heavy-hitter certificate: kept estimates are EXACT, the " +
    "summary is bounded, and no absent key can beat its bucket threshold") {
    val exact = graft.Tables.events(spark, sf001)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("q127_heavy_hitters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 16 * 5,
      s"summary must be ≤ 80 rows at ANY volume, got ${rows.length}")
    val kept = rows.map(t => t._2).toSet
    val thr = rows.groupBy(_._1).view.mapValues(_.head._4).toMap
    rows.foreach { case (b, u, est, t) =>
      assert(u % 16 == b, s"user $u filed under wrong bucket $b")
      assert(est == exact(u),
        s"kept estimate for $u must be EXACT (key-disjoint buckets): $est != ${exact(u)}")
      assert(thr(b) == t, "threshold must be constant per bucket")
    }
    // the certificate: every key ABSENT from the summary is bounded by its
    // bucket's threshold, so any count > max(thr) is provably present
    exact.foreach { case (u, n) =>
      if (!kept.contains(u))
        assert(n <= thr.getOrElse(u % 16, 0L),
          s"absent user $u has count $n above its bucket threshold")
    }
    val maxThr = thr.values.max
    exact.foreach { case (u, n) =>
      if (n > maxThr)
        assert(kept.contains(u), s"certified heavy hitter $u missing ($n > $maxThr)")
    }
  }

  test("round-9 invariants: q128 z-order tiles are narrow in BOTH dims, " +
    "q129 diff buckets are exactly the drifted ones, q130 chunks tile " +
    "each document with stride-30 windows") {
    // q128: replay the bucket/interleave arithmetic in Scala and compare
    // per-file extents exactly; then the layout claim itself — 16
    // consecutive z-values are a 4×4 Morton tile, so EVERY file must span
    // ≤ 4 buckets in BOTH dimensions (a 1-D sorted layout is full-width in
    // the other dimension; that contrast is the whole point of z-order).
    val ord = graft.Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderstatus").collect()
    val epoch = java.time.LocalDate.of(1995, 1, 1)
    val maxCk = ord.map(_.getLong(1)).max
    val xy = ord.map { r =>
      val dd = java.time.temporal.ChronoUnit.DAYS.between(
        epoch, r.getAs[java.time.LocalDateTime]("o_orderdate").toLocalDate)
      val x = math.min(31L, dd * 32 / 2405)
      val y = r.getLong(1) * 32 / (maxCk + 1)
      val z = (0 until 5).map { i =>
        (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      }.sum
      (z / 16, x, y)
    }
    val expFiles = xy.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_._2).min, rs.map(_._2).max,
        rs.map(_._3).min, rs.map(_._3).max)
    }.toMap
    val gotFiles = run("q128_zorder_layout").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(gotFiles == expFiles, "q128 per-file extents differ from replay")
    gotFiles.foreach { case (f, (_, minD, maxD, minK, maxK)) =>
      assert(maxD - minD <= 3 && maxK - minK <= 3,
        s"file $f spans >4 buckets in a dimension — not a Morton tile")
    }
    assert(gotFiles.values.map(_._1).sum == ord.length.toLong)

    // q129: the diff buckets must be EXACTLY those holding a deleted
    // (key%97=31) or updated (key%101=7) row, and cnt_a−cnt_b must equal
    // the bucket's deletion count (checksums catch the pure updates).
    val drift = ord.map(_.getLong(0)).groupBy(_ % 64).view.mapValues { ks =>
      (ks.count(_ % 97 == 31).toLong, ks.exists(k => k % 97 == 31 || k % 101 == 7))
    }.toMap
    val diffRows = run("q129_snapshot_diff").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getString(5))))
      .toMap
    assert(diffRows.keySet == drift.keySet)
    diffRows.foreach { case (b, (cntA, cntB, status)) =>
      val (nDel, drifted) = drift(b)
      assert(cntA - cntB == nDel, s"bucket $b deletion count mismatch")
      assert(status == (if (drifted) "diff" else "match"),
        s"bucket $b status $status disagrees with drift replay")
    }
    assert(diffRows.values.exists(_._3 == "diff") &&
      diffRows.values.exists(_._3 == "match"), "q129 is vacuous")

    // q130: full Scala replay of the chunking (size 40, stride 30), plus
    // the tiling facts — every non-final chunk is exactly 40 tokens, the
    // final chunk ends exactly at the document's last token, and chunk k
    // starts at token 30k (10-token overlap between neighbors).
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val expChunks = docs.flatMap { case (id, toks) =>
      val n = toks.length
      val kMax = math.max(0L, math.ceil((n - 40) / 30.0).toLong)
      (0L to kMax).map { k =>
        val start = (k * 30).toInt
        (id, k, math.min(n - start, 40).toLong,
          toks(start), toks(math.min(n, start + 40) - 1))
      }
    }.sortBy(t => (t._1, t._2))
    val gotChunks = run("q130_chunk_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4)))
    assert(gotChunks.toSeq == expChunks.toSeq,
      "q130 chunks differ from the Scala replay")
    gotChunks.groupBy(_._1).foreach { case (id, cs) =>
      val kMax = cs.map(_._2).max
      cs.foreach { case (_, k, len, _, _) =>
        if (k < kMax) assert(len == 40L, s"doc $id non-final chunk $k len $len")
        else assert(k * 30 + len == docs.find(_._1 == id).get._2.length.toLong,
          s"doc $id final chunk does not end at the last token")
      }
    }
  }

  test("round-9b invariants: q131 point-in-time statuses replay, q132 " +
    "k-anonymity histogram accounts for every customer, q133 chi-square " +
    "cells reproduce from exact marginals") {
    // q131: sequential per-user replay — walk each carve user's state
    // events in (ts, event_id) order and look up the status active at
    // each error's timestamp.
    val ev = graft.Tables.events(spark, sf001)
      .where(col("user_id") % 7 === 0)
      .select("user_id", "event_id", "ts", "event_type", "value").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getLong(0), r.getLong(1),
          i.getEpochSecond * 1000000L + i.getNano / 1000L, // exact micros
          r.getString(3), r.getDouble(4))
      }
    val states = Set("signup", "view", "purchase")
    val byUser = ev.groupBy(_._1)
    val expAgg = ev.filter(_._4 == "error").map { case (u, _, ts, _, v) =>
      val changes = byUser(u).filter(e => states(e._4)).sortBy(e => (e._3, e._2))
        .foldLeft(Vector.empty[(Long, String)]) { (acc, e) =>
          if (acc.lastOption.exists(_._2 == e._4)) acc else acc :+ ((e._3, e._4))
        }
      val status = changes.takeWhile(_._1 <= ts).lastOption.map(_._2)
        .getOrElse("none")
      (status, u, v)
    }.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(_._2).distinct.length.toLong,
        xs.map(x => BigDecimal(x._3).setScale(4)).sum.toDouble)
    }.toMap
    val gotAgg = run("q131_temporal_join").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(gotAgg == expAgg, "q131 point-in-time aggregation differs from replay")
    assert(gotAgg.values.map(_._1).sum == ev.count(_._4 == "error").toLong,
      "q131 must account for every error event exactly once")

    // q132: every customer lands in exactly one equivalence class;
    // histogram row arithmetic must agree with a direct regroup.
    val cust = graft.Tables.customer(spark, sf001)
      .select("c_mktsegment", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getInt(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val expHist = cust.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).view
      .mapValues(ks => (ks.size.toLong, ks.sum)).toMap
    val gotHist = run("q132_kanon_audit").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(gotHist.view.mapValues(v => (v._1, v._2)).toMap == expHist,
      "q132 class-size histogram differs from replay")
    assert(gotHist.values.map(_._2).sum == cust.length.toLong,
      "q132 histogram must account for every customer")
    gotHist.foreach { case (k, (nc, ncust, risk)) =>
      assert(ncust == k * nc, s"q132 row k=$k: n_customers != k*n_classes")
      assert(risk == (if (k < 5) "violating" else "anonymous"))
    }

    // q133: per-cell expected/contrib are closed forms of exact integer
    // marginals; replay them and check the identities Σobs = Σexp per row
    // margin (within nothing — expected sums are exact rationals summing
    // to the row total, checked on the doubles to 1e-9 relative).
    val rows = run("q133_chisq_cells").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val obs = rows.map { case (t, s, o, _, _) => (t, s) -> o }.toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val gt = rows.map(_._3).sum
    rows.foreach { case (t, s, o, e, c) =>
      val eExp = (rt(t) * ct(s)).toDouble / gt.toDouble
      assert(e == eExp, s"q133 cell ($t,$s) expected $e != $eExp")
      val cExp = (o.toDouble - eExp) * (o.toDouble - eExp) / eExp
      assert(c == cExp, s"q133 cell ($t,$s) contrib mismatch")
      assert(c >= 0.0)
    }
    // the contingency table covers every joined event exactly once
    val nJoined = graft.Tables.events(spark, sf001).join(
      graft.Tables.customer(spark, sf001),
      col("user_id") === col("c_custkey")).count()
    assert(gt == nJoined, "q133 cells must cover every joined event")
    assert(obs.size == rows.length, "q133 (type, segment) cells must be unique")
  }

  test("round-9c invariants: q134 unigram NLL, q135 KS drift, q136 " +
    "partition balance, and q137 sorted-neighborhood all reproduce from " +
    "exact Scala replays") {
    import java.math.RoundingMode.HALF_UP

    // q134: replay the add-one-smoothed unigram LM and per-doc NLL sums.
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(t => (id, lang, t)) }
    val cnt = toks.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val tot = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = toks.map(_._3).distinct.length.toLong
    val nll = cnt.map { case ((lang, tok), c) =>
      (lang, tok) -> BigDecimal(-math.log((c + 1).toDouble / (tot(lang) + v).toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) }
    val expNll = toks.groupBy(_._1).view.mapValues { ts =>
      val s = ts.map(t => nll((t._2, t._3))).sum
      (ts.length.toLong, s.toDouble, s.toDouble / ts.length) }.toMap
    val gotNll = run("q134_unigram_nll").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(gotNll == expNll, "q134 per-doc NLL differs from LM replay")
    assert(gotNll.size == docs.length, "q134 must score every document")

    // q135: replay the exact two-sample KS per-decile profile.
    val evs = graft.Tables.events(spark, sf001)
      .select("ts", "value").collect().map { r =>
        val i = r.getAs[java.sql.Timestamp](0).toInstant
        (i.getEpochSecond * 1000000L + i.getNano / 1000L,
          (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            * 100).toLongExact) }
    val (mnUs, mxUs) = (evs.map(_._1).min, evs.map(_._1).max)
    val byv = evs.groupBy(_._2).view.mapValues { xs =>
      (xs.count(x => 2 * x._1 < mnUs + mxUs).toLong,
        xs.count(x => 2 * x._1 >= mnUs + mxUs).toLong) }
      .toSeq.sortBy(_._1)
    val (na, nb) = (byv.map(_._2._1).sum, byv.map(_._2._2).sum)
    var (ra, rb) = (0L, 0L)
    val dsByV = byv.map { case (vv, (ca, cb)) =>
      ra += ca; rb += cb
      (vv, math.abs(ra.toDouble / na.toDouble - rb.toDouble / nb.toDouble)) }
    val expKs = dsByV.groupBy(_._1 / 5000).view.mapValues { xs =>
      val best = xs.minBy { case (vv, dd) => (-dd, vv) }
      (xs.length.toLong, best._1, best._2) }.toMap
    val gotKs = run("q135_ks_drift").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotKs == expKs, "q135 per-decile KS profile differs from replay")
    assert(gotKs.values.map(_._1).sum == byv.length.toLong,
      "q135 deciles must cover every distinct value")

    // q136: replay both layouts; totals must cover every event per scheme.
    val uids = graft.Tables.events(spark, sf001)
      .select("user_id").collect().map(_.getLong(0))
    val base = uids.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (mnU, mxU, nEv) = (base.keys.min, base.keys.max, uids.length.toLong)
    val wWidth = (mxU - mnU + 16) / 16
    def rollup(f: Long => Long): Map[Long, (Long, Long, Double)] =
      base.toSeq.groupBy(kv => f(kv._1)).view.mapValues { xs =>
        val nr = xs.map(_._2).sum
        (nr, xs.length.toLong, (nr * 16).toDouble / nEv.toDouble) }.toMap
    val expBal =
      rollup(u => (u - mnU) / wWidth).map { case (b, t) => ("range", b) -> t } ++
        rollup(u => u * 7919 % 104729 % 16).map { case (b, t) => ("hash", b) -> t }
    val gotBal = run("q136_partition_balance").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(gotBal == expBal, "q136 layout rollup differs from replay")
    assert(gotBal.filterKeys(_._1 == "hash").values.map(_._1).sum == nEv &&
      gotBal.filterKeys(_._1 == "range").values.map(_._1).sum == nEv,
      "q136 each scheme must account for every event")

    // q137: replay blocked sorted-neighborhood candidate generation.
    val snPairs = docs.groupBy(dd => (dd._2, dd._3.take(8))).values.flatMap { blk =>
      val sorted = blk.sortBy(dd => (dd._3, dd._1)).toVector
      for {
        i <- sorted.indices; off <- 1 to 2; if i + off < sorted.length
        (ia, la, ta) = sorted(i); (ib, _, tb) = sorted(i + off)
        sa = ta.split(" ", -1).distinct.toSet; sb = tb.split(" ", -1).distinct.toSet
        nc = (sa & sb).size.toLong
        j = nc.toDouble / (sa.size.toLong + sb.size.toLong - nc).toDouble
        if j >= 0.6
      } yield (la, ia, ib) -> j
    }.toMap
    val gotSn = run("q137_sorted_neighborhood").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(gotSn == snPairs, "q137 SNM pairs differ from replay")
  }

  test("round-9d invariants: q138 equi-depth histogram, q139 priority " +
    "sample, q140 two-regressor OLS, and q141 trigram mining all " +
    "reproduce from exact Scala replays") {
    // Shared exact-cents extraction of the events table.
    val evRows = graft.Tables.events(spark, sf001)
      .select("ts", "value", "user_id", "event_id", "event_type").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp](0).toInstant
        (i.getEpochSecond * 1000000L + i.getNano / 1000L,
          (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            * 100).toLongExact,
          r.getLong(2), r.getLong(3), r.getString(4)) }

    // q138: replay bucket assignment off the exclusive cumulative count.
    val cnts = evRows.groupBy(_._2).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val nTot = evRows.length.toLong
    var cx = 0L
    val expHist = cnts.map { case (v, c) =>
      val b = cx * 16 / nTot; cx += c; (b, v, c) }
      .groupBy(_._1).view.mapValues { xs =>
        (xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).sum, xs.length.toLong) }
      .toMap
    val gotHist138 = run("q138_equidepth_hist").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(gotHist138 == expHist, "q138 histogram differs from replay")
    assert(gotHist138.values.map(_._3).sum == nTot,
      "q138 buckets must cover every event")
    // equi-depth property: no bucket except heavy-value stragglers can
    // exceed n/16 + max single-value count
    val maxC = cnts.map(_._2).max
    assert(gotHist138.values.forall(_._3 <= nTot / 16 + maxC),
      "q138 bucket depth exceeds the equi-depth bound")

    // q139: replay the weighted priority order on orders.
    val ords = graft.Tables.orders(spark, sf001)
      .select("o_orderkey", "o_totalprice").collect()
      .map { r =>
        val w = (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        (r.getLong(0), w) }
    val expSample = ords.map { case (k, w) =>
      val u = (k * 7919 + 13) % 104729 + 1
      (u.toDouble / w.toDouble, k, w) }
      .sortBy(x => (x._1, x._2)).take(20)
      .map { case (p, k, w) => (k, w, p) }.toVector
    val gotSample = run("q139_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toVector
    assert(gotSample == expSample, "q139 top-20 priorities differ from replay")

    // q140: replay the closed-form normal equations with exact BigInt
    // moments, double-cast at the same points as the query.
    val groups = evRows.groupBy(_._5)
    val expOls = groups.view.mapValues { xs =>
      val obs = xs.map { e =>
        val zi = java.time.Instant.ofEpochSecond(e._1 / 1000000L,
          (e._1 % 1000000L) * 1000L).atZone(java.time.ZoneOffset.UTC)
        (BigInt(zi.getHour), BigInt(zi.getDayOfWeek.getValue), BigInt(e._2)) }
      val n = BigInt(obs.length)
      val sx1 = obs.map(_._1).sum; val sx2 = obs.map(_._2).sum
      val sy = obs.map(_._3).sum
      val sx1x1 = obs.map(o => o._1 * o._1).sum
      val sx2x2 = obs.map(o => o._2 * o._2).sum
      val sx1x2 = obs.map(o => o._1 * o._2).sum
      val sx1y = obs.map(o => o._1 * o._3).sum
      val sx2y = obs.map(o => o._2 * o._3).sum
      val m11 = (n * sx1x1 - sx1 * sx1).toDouble
      val m22 = (n * sx2x2 - sx2 * sx2).toDouble
      val m12 = (n * sx1x2 - sx1 * sx2).toDouble
      val c1 = (n * sx1y - sx1 * sy).toDouble
      val c2 = (n * sx2y - sx2 * sy).toDouble
      val det = m11 * m22 - m12 * m12
      val b1 = (m22 * c1 - m12 * c2) / det
      val b2 = (m11 * c2 - m12 * c1) / det
      val b0 = (sy.toDouble - b1 * sx1.toDouble - b2 * sx2.toDouble) / n.toDouble
      (obs.length.toLong, b0, b1, b2, det != 0.0)
    }.toMap
    val gotOls = run("q140_ols2").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    expOls.foreach { case (t, (n, b0, b1, b2, nondegenerate)) =>
      if (nondegenerate) {
        assert(gotOls.contains(t), s"q140 missing group $t")
        assert(gotOls(t) == ((n, b0, b1, b2)), s"q140 group $t coefficients differ")
      } else assert(!gotOls.contains(t), s"q140 degenerate group $t must be excluded")
    }

    // q141: replay per-user ordered trigram extraction and the top-20.
    val expTri = evRows.groupBy(_._3).values.flatMap { xs =>
      val seq = xs.sortBy(e => (e._1, e._4)).map(_._5).toVector
      seq.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2)))
    }.toVector.groupBy(identity).view.mapValues(_.length.toLong)
      .toVector.map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(20)
    val gotTri = run("q141_event_trigrams").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toVector
    assert(gotTri == expTri, "q141 trigram top-20 differs from replay")
  }

  test("round-9e invariants: q142 containment hits are exactly the docs " +
    "holding all rare probes, q143 golden records apply the survivorship " +
    "rules field by field") {
    // q142: replay rare-probe selection and containment.
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val freq = docs.flatMap { case (id, lang, t) =>
      t.split(" ", -1).map(tok => (lang, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val probes = freq.toSeq.groupBy(_._1._1).view.mapValues { xs =>
      xs.sortBy { case ((_, tok), n) => (n, tok) }.take(3).map(_._1._2).toSet
    }.toMap
    val expHits = docs.collect { case (id, lang, t)
      if probes(lang).subsetOf(t.split(" ", -1).toSet) => (lang, id) }.toSet
    val gotHits = run("q142_containment_join").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotHits == expHits, "q142 containment set differs from replay")

    // q143: field-by-field survivorship replay.
    val cust = graft.Tables.customer(spark, sf001)
      .select("c_custkey", "c_acctbal", "c_mktsegment", "c_name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
    val got143 = run("q143_golden_record").collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(got143.size == cust.length, "q143 must emit one golden record per key")
    cust.foreach { case (k, bal, seg, name) =>
      val (gBal, gSeg, gName, nSrc) = got143(k)
      val expBal = if (k % 5 == 0)
        (BigDecimal(bal).setScale(2, BigDecimal.RoundingMode.HALF_UP) + 100).toDouble
      else bal
      assert(gBal == expBal, s"q143 key $k balance: $gBal != $expBal")
      assert(gSeg == (if (k % 7 == 0) "CORRECTED" else seg), s"q143 key $k segment")
      assert(gName == name, s"q143 key $k name must come from the base source")
      assert(nSrc == 1L + (if (k % 5 == 0) 1 else 0) + (if (k % 7 == 0) 1 else 0),
        s"q143 key $k source count")
    }
  }

  test("round-9f invariants: q144 estimates bracket the exact self-join " +
    "sizes per statistics bucket, q145 CDC apply reconciles row-for-row " +
    "against a sequential merge replay") {
    // q144: exact per-bucket replay + the AM-QM inequality (the
    // uniformity estimate rows²/ndv NEVER exceeds the exact Σn² — so
    // q_err ≤ 1 is structural, not data luck).
    val uids = graft.Tables.events(spark, sf001)
      .select("user_id").collect().map(_.getLong(0))
    val perUser = uids.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expBuckets = perUser.toSeq.groupBy(kv => kv._1 * 7919 % 104729 % 16)
      .view.mapValues { xs =>
        val rows = xs.map(_._2).sum; val ndv = xs.length.toLong
        val actual = xs.map(kv => kv._2 * kv._2).sum
        (rows, ndv, (rows * rows).toDouble / ndv.toDouble, actual,
          (rows * rows).toDouble / ndv.toDouble / actual.toDouble) }.toMap
    val got144 = run("q144_cardest_audit").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got144 == expBuckets, "q144 bucket statistics differ from replay")
    got144.values.foreach { case (_, _, est, actual, qerr) =>
      assert(est <= actual.toDouble && qerr <= 1.0,
        "uniformity estimate exceeded the exact size — AM-QM violated")
    }

    // q145: sequential merge replay over the base + changelog.
    val ords = graft.Tables.orders(spark, sf001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expFinal = scala.collection.mutable.Map.empty[Long, (String, String, BigDecimal)]
    ords.foreach { case (k, st, p) =>
      expFinal(k) = (st, "kept", BigDecimal(p).setScale(4)) }
    // apply in seq order: D (seq1), U (seq2), I (seq3) — latest op wins,
    // which sequential application reproduces exactly
    ords.foreach { case (k, _, _) if k % 11 == 0 => expFinal.remove(k); case _ => }
    ords.foreach { case (k, st, p) if k % 13 == 0 =>
      expFinal(k) = (st, "updated", BigDecimal(p).setScale(2) + 1); case _ => }
    ords.foreach { case (k, st, p) if k % 17 == 0 =>
      expFinal(k + 10000000L) = (st, "inserted", BigDecimal(p).setScale(4)); case _ => }
    val expAgg = expFinal.values.groupBy(v => (v._1, v._2)).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._3.setScale(4)).sum.toDouble) }.toMap
    val got145 = run("q145_cdc_apply").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got145 == expAgg, "q145 post-merge reconciliation differs from replay")
    // every surviving key is accounted for exactly once
    assert(got145.values.map(_._1).sum == expFinal.size.toLong)
  }

  test("round-9g invariants: q146 A/B readout reproduces from a per-user " +
    "replay, q147 freshness lags reconcile against the global high-water mark") {
    val evs = graft.Tables.events(spark, sf001)
      .select("user_id", "event_type", "value", "ts").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp](3).toInstant
        (r.getLong(0), r.getString(1), r.getDouble(2),
          i.getEpochSecond * 1000000L + i.getNano / 1000L) }

    // q146: per-user conversion + pooled z replay (identical double shape)
    val conv = evs.groupBy(_._1).view.mapValues(
      _.exists(e => e._2 == "purchase" && e._3 > 150)).toMap
    val byVar = conv.toSeq.groupBy(kv => kv._1 * 7919 % 104729 % 2)
    val (n0, c0) = (byVar(0).size.toLong, byVar(0).count(_._2).toLong)
    val (n1, c1) = (byVar(1).size.toLong, byVar(1).count(_._2).toLong)
    val p = (c0 + c1).toDouble / (n0 + n1).toDouble
    val expZ = (c1.toDouble / n1.toDouble - c0.toDouble / n0.toDouble) /
      math.sqrt(p * (1 - p) * (1 / n0.toDouble + 1 / n1.toDouble))
    val row = run("q146_ab_test").collect()
    assert(row.length == 1, "q146 must emit exactly one readout row")
    val r0 = row.head
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getLong(3)) ==
      ((n0, c0, n1, c1)), "q146 variant counts differ from replay")
    assert(r0.getDouble(4) == c0.toDouble / n0.toDouble &&
      r0.getDouble(5) == c1.toDouble / n1.toDouble &&
      r0.getDouble(6) == expZ, "q146 rates/z differ from replay")

    // q147: per-type freshness replay; the global-max type must have
    // lag 0 and every lag/stale fraction must reconcile
    val gmax = evs.map(_._4).max
    val expFresh = evs.groupBy(_._2).view.mapValues { xs =>
      val tmax = xs.map(_._4).max
      (xs.length.toLong, tmax, gmax - tmax,
        xs.count(_._4 < gmax - 604800000000L).toDouble / xs.length.toDouble) }.toMap
    val gotFresh = run("q147_freshness_audit").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(gotFresh == expFresh, "q147 freshness audit differs from replay")
    assert(gotFresh.values.exists(_._3 == 0L),
      "q147: some type must own the global high-water mark")

    // q148: sequential per-user CEP replay — walk each user's timeline in
    // (us, event_id) order tracking last click/error; a purchase matches
    // iff a click exists with no later error strictly before the purchase.
    val evs148 = graft.Tables.events(spark, sf001)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp](3).toInstant
        (r.getLong(0), r.getLong(1), r.getString(2),
          i.getEpochSecond * 1000000L + i.getNano / 1000L) }
    val expCep = evs148.groupBy(_._1).view.mapValues { xs =>
      var (lastClick, lastError) = (Option.empty[Long], Option.empty[Long])
      var (nP, nClean) = (0L, 0L)
      xs.sortBy(e => (e._4, e._2)).foreach { e =>
        if (e._3 == "purchase") {
          nP += 1
          if (lastClick.isDefined &&
            (lastError.isEmpty || lastError.get < lastClick.get)) nClean += 1
        }
        if (e._3 == "click") lastClick = Some(e._4)
        if (e._3 == "error") lastError = Some(e._4)
      }
      (nP, nClean)
    }.filter(_._2._2 > 0).toMap
    val gotCep = run("q148_pattern_negation").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotCep == expCep, "q148 CEP-negation counts differ from sequential replay")

    // q149: replay the max-min semiring product over the transition graph.
    val edges = evs148.groupBy(_._1).values.flatMap { xs =>
      val seq = xs.sortBy(e => (e._4, e._2)).map(_._3).toVector
      seq.zip(seq.drop(1))
    }.toVector.groupBy(p => p).view.mapValues(_.length.toLong).toMap
    val expWide = (for {
      ((a, b1), w1) <- edges.toSeq; ((b2, c), w2) <- edges.toSeq; if b1 == b2
    } yield ((a, c), (math.min(w1, w2), b1)))
      .groupBy(_._1).view.mapValues { xs =>
        val best = xs.map(_._2).minBy { case (wd, via) => (-wd, via) }
        (edges.get((xs.head._1._1, xs.head._1._2)), best._1, best._2) }.toMap
    val gotWide = run("q149_widest_path").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3), r.getString(4))))
      .toMap
    assert(gotWide == expWide, "q149 widest-path table differs from semiring replay")
    // width of a 2-hop path can never exceed the bottleneck: every width
    // must equal min of some edge pair — and appear among edge weights
    val weightSet = edges.values.toSet
    assert(gotWide.values.forall(v => weightSet.contains(v._2)),
      "q149 widths must be actual edge weights (min of a pair)")

    // q150: exact-median + histogram-interpolation replay, and the
    // STRUCTURAL bound: exact and estimate share the median bin, so
    // |err| < bin width by construction.
    val cents = graft.Tables.events(spark, sf001).select("value").collect()
      .map(r => (BigDecimal(r.getDouble(0))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
    val sortedC = cents.sorted
    val k = (sortedC.length + 1) / 2
    val exactMed = sortedC(k - 1)
    val binCounts = cents.groupBy(_ / 500).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var bcx = 0L
    val (mbin, mbcx, mbc) = binCounts.collectFirst {
      case (b, c) if { val before = bcx; bcx += c; before + c >= k } =>
        (b, bcx - c, c)
    }.get
    val estMed = mbin * 500 + (k - mbcx).toDouble / mbc.toDouble * 500
    val r150 = run("q150_hist_median_audit").collect()
    assert(r150.length == 1)
    val h = r150.head
    assert(h.getLong(0) == exactMed && h.getDouble(1) == estMed &&
      h.getDouble(2) == math.abs(estMed - exactMed.toDouble) &&
      h.getLong(3) == 500L, "q150 audit row differs from replay")
    assert(h.getDouble(2) < 500.0,
      "q150 structural bound violated: |err| must stay under the bin width")

    // q151: replay the ranked-decile lift table (conversion = purchase > 150).
    val usersConv = graft.Tables.events(spark, sf001)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues { xs =>
        (xs.length.toLong,
          if (xs.exists(e => e._2 == "purchase" && e._3 > 150)) 1L else 0L) }.toMap
    val nU = usersConv.size.toLong
    val tc = usersConv.values.map(_._2).sum
    val byScore = usersConv.values.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2).sum) }.toSeq.sortBy(-_._1)
    var cxS = 0L
    val expLift = byScore.map { case (_, (cnt, cc)) =>
      val d = cxS * 10 / nU; cxS += cnt; (d, cnt, cc) }
      .groupBy(_._1).view.mapValues { xs =>
        val (nu, nc) = (xs.map(_._2).sum, xs.map(_._3).sum)
        val rate = nc.toDouble / nu.toDouble
        (nu, nc, rate, rate / (tc.toDouble / nU.toDouble)) }.toMap
    val gotLift = run("q151_decile_lift").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(gotLift == expLift, "q151 lift table differs from replay")
    assert(gotLift.values.map(_._1).sum == nU && gotLift.values.map(_._2).sum == tc,
      "q151 deciles must cover every user and every conversion")

    // q152: replay first-click → first-subsequent-purchase durations per
    // cohort; percentiles must land inside the bracketing order
    // statistics (formula-independent check).
    val durByCohort = evs148.groupBy(_._1).values.flatMap { xs =>
      val clicks = xs.filter(_._3 == "click")
      if (clicks.isEmpty) None
      else {
        val fcUs = clicks.map(_._4).min
        val after = xs.filter(e => e._3 == "purchase" && e._4 > fcUs)
        if (after.isEmpty) None
        else {
          val week = java.time.Instant.ofEpochSecond(fcUs / 1000000L)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate
          val cohort = week.minusDays((week.getDayOfWeek.getValue - 1).toLong)
          Some(cohort.toString -> (after.map(_._4).min - fcUs))
        }
      }
    }.toVector.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got152 = run("q152_time_to_convert").collect()
      .map(r => r.getAs[java.sql.Date](0).toString ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got152.keySet == durByCohort.keySet, "q152 cohorts differ from replay")
    got152.foreach { case (c, (n, med, p90)) =>
      val ds = durByCohort(c)
      assert(n == ds.length.toLong, s"q152 cohort $c user count differs")
      def bracket(p: Double, v: Double): Unit = {
        val pos = p * (ds.length - 1)
        val (lo, hi) = (ds(pos.toInt), ds(math.ceil(pos).toInt))
        assert(v >= lo.toDouble && v <= hi.toDouble,
          s"q152 cohort $c p$p=$v outside [$lo, $hi]")
      }
      bracket(0.5, med); bracket(0.9, p90)
    }

    // q153: frame-edge window functions replay against each user's
    // fully-sorted timeline.
    val exp153 = evs148.groupBy(_._1).view.mapValues { xs =>
      val seq = xs.sortBy(e => (e._4, e._2)).map(_._3)
      (seq.head, if (seq.length >= 2) seq(1) else null,
        seq.last, seq.length.toLong) }.toMap
    val got153 = run("q153_window_edges").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(got153 == exp153, "q153 frame-edge values differ from replay")
    assert(got153.size == evs148.map(_._1).distinct.length,
      "q153 must emit one bookend row per user")

    // q154: HHI replay + the structural range 1/n_sources ≤ hhi ≤ 1.
    val docs154 = graft.Tables.documents(spark, sf001)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp154 = docs154.groupBy(_._1).view.mapValues { xs =>
      val cnts = xs.groupBy(_._2).values.map(_.length.toLong).toVector
      val n = cnts.sum
      (cnts.length.toLong, n,
        cnts.map(c => c * c).sum.toDouble / (n * n).toDouble,
        cnts.max.toDouble / n.toDouble) }.toMap
    val got154 = run("q154_source_concentration").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got154 == exp154, "q154 concentration table differs from replay")
    got154.values.foreach { case (ns, _, hhi, top) =>
      assert(hhi >= 1.0 / ns.toDouble - 1e-12 && hhi <= 1.0 &&
        top * top <= hhi + 1e-12,
        "q154 structural HHI bounds violated (1/n_sources ≤ hhi ≤ 1, top² ≤ hhi)")
    }
  }

  test("q155–q159 round-10 text/curation audits hold their structural bounds") {
    // q155: 0 ≤ min ≤ avg ≤ max ≤ ln(vocab) (+ rounding slack: per-type
    // terms round to 4 decimals, ≤ 31 types/doc on this corpus)
    val docs = graft.Tables.documents(spark, sf001)
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    val hMax = math.log(vocab.toDouble) + 31 * 5e-5
    run("q155_token_entropy").collect().foreach { r =>
      val (avg, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn >= 0 && mn <= avg && avg <= mx && mx <= hMax,
        s"q155 entropy bounds violated: $r (ln V = $hMax)")
    }
    // q156: every language's avg NLL is positive and below ln(c1_max + V)
    // (add-one smoothing keeps every probability in (0, 1)); bigram count
    // is exactly Σ_docs (len - 1)
    val nBigrams = docs.select((size(split(col("text"), " ")) - 1).cast("long").as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    val got156 = run("q156_bigram_nll").collect()
    assert(got156.map(_.getLong(1)).sum == nBigrams, "q156 bigram count wrong")
    got156.foreach(r => assert(r.getDouble(3) > 0, s"q156 NLL not positive: $r"))
    // q157: per source, distinct ≤ total and inflation ≥ 1; totals cover
    // the corpus
    val got157 = run("q157_dup_inflation").collect()
    assert(got157.map(_.getLong(1)).sum == docs.count())
    got157.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getDouble(4) >= 1.0, s"q157: $r")
    }
    // q158: novel docs across sources == corpus-wide distinct texts;
    // rates in (0, 1]
    val nDistinctTexts = docs.select("text").distinct().count()
    val got158 = run("q158_novelty_rate").collect()
    assert(got158.map(_.getLong(2)).sum == nDistinctTexts, "q158 novelty sum wrong")
    got158.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, s"q158: $r")
    }
    // q159: distinct ≤ occurrences, top share in (0, 1], occurrences =
    // Σ_docs (len - 2) within each language's docs summed globally
    val nTrigrams = docs.select((size(split(col("text"), " ")) - 2).cast("long").as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    val got159 = run("q159_trigram_coverage").collect()
    assert(got159.map(_.getLong(1)).sum == nTrigrams, "q159 trigram count wrong")
    got159.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getDouble(4) > 0 && r.getDouble(4) <= 1.0,
        s"q159: $r")
    }
  }

  test("q160–q164 round-10 batch-2 audits hold their structural bounds") {
    val docs = graft.Tables.documents(spark, sf001)
    // q160: pair matrix is upper-triangular; n_common ≤ min(sz); jaccard
    // is exactly n_common/(union) and in (0, 1]; row count ≤ C(nsrc, 2)
    val got160 = run("q160_source_overlap").collect()
    got160.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (nc, sa, sb, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b && nc >= 1 && nc <= math.min(sa, sb) && j > 0 && j <= 1.0, s"q160: $r")
      assert(j == nc.toDouble / (sa + sb - nc), s"q160 jaccard identity: $r")
    }
    val nSources = docs.select("source").distinct().count()
    assert(got160.length <= nSources * (nSources - 1) / 2)
    // q161: label counts cover the embeddings table; cosines in [-1, 1];
    // away-count bounded by the label count
    val got161 = run("q161_embed_outliers").collect()
    assert(got161.map(_.getLong(1)).sum == graft.Tables.embeddings(spark, sf001).count())
    got161.foreach { r =>
      val (n, mn, mx, away) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(mn >= -1.0 - 1e-12 && mn <= mx && mx <= 1.0 + 1e-12 && away <= n, s"q161: $r")
    }
    // q162: bigram mass across languages is exactly Σ(len−1); every
    // context contributes ≥ 1 to top-1 mass; predictability in (0, 1]
    val nBigrams = docs.select((size(split(col("text"), " ")) - 1).cast("long").as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    val got162 = run("q162_next_token_predictability").collect()
    assert(got162.map(_.getLong(2)).sum == nBigrams, "q162 bigram count wrong")
    got162.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3) && r.getLong(3) <= r.getLong(2), s"q162: $r")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0, s"q162 share: $r")
    }
    // q163: the CSV is sorted, duplicate-free, has exactly n_vocab parts,
    // and csv_len is its length
    run("q163_vocab_stringagg").collect().foreach { r =>
      val parts = r.getString(2).split(",")
      assert(parts.length.toLong == r.getLong(1), s"q163 parts: $r")
      assert(parts.sameElements(parts.distinct.sorted), s"q163 order: $r")
      assert(r.getInt(3) == r.getString(2).length, s"q163 len: $r")
    }
    // q164: within each month the ranks are exactly the permutation 1..n;
    // within each nation the delta reconciles against the previous
    // PRESENT month's rank (null on the nation's first month)
    val got164 = run("q164_rank_movers").collect()
    got164.groupBy(_.get(0)).foreach { case (_, rows) =>
      val rks = rows.map(_.getInt(3)).sorted
      assert(rks.sameElements(1 to rks.length), "q164 ranks not a permutation")
    }
    got164.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val srt = rows.sortBy(_.getDate(0).toString)
      srt.zipWithIndex.foreach { case (r, i) =>
        if (i == 0) assert(r.isNullAt(4), s"q164 first-month delta: $r")
        else assert(r.getInt(4) == r.getInt(3) - srt(i - 1).getInt(3), s"q164 delta: $r")
      }
    }
  }

  test("q165–q169 round-10 batch-3 curation/monitor ops hold their bounds") {
    val docs = graft.Tables.documents(spark, sf001)
    // q165: the BPE pretokenizer never merges whitespace tokens, so
    // fertility ≥ 1; counts positive
    run("q165_bpe_fertility").collect().foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) >= r.getLong(2), s"q165: $r")
      assert(r.getDouble(4) >= 1.0, s"q165 fertility < 1: $r")
    }
    // q166: the schedule emits each source's docs in rank order (the
    // interleave is a merge of per-source sequences), rn ≤ n_src, and
    // pos_key is non-decreasing in output order
    val got166 = run("q166_mix_schedule").collect()
    assert(got166.length == math.min(500L, docs.count()).toInt)
    var prevKey = 0.0
    got166.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= r.getLong(3), s"q166 rn bound: $r")
      assert(r.getDouble(4) >= prevKey, s"q166 pos_key order: $r")
      prevKey = r.getDouble(4)
    }
    got166.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val rns = rows.map(_.getInt(2))
      assert(rns.sameElements(1 to rns.length), "q166 per-source ranks not 1..k in order")
    }
    // q167: kept = Σ_blocks min(2, |block|), recomputed independently;
    // totals cover the corpus
    val got167 = run("q167_cap_duplicates").collect()
    assert(got167.map(_.getLong(1)).sum == docs.count())
    val expectedKept = docs
      .withColumn("blk", array_join(slice(split(col("text"), " "), 1, 8), " "))
      .groupBy("lang", "blk").agg(count(lit(1)).as("n"))
      .agg(sum(least(col("n"), lit(2L)))).collect()(0).getLong(0)
    assert(got167.map(_.getLong(2)).sum == expectedKept, "q167 kept total wrong")
    got167.foreach(r => assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0, s"q167: $r"))
    // q168: every label keeps exactly the minority count; totals cover
    val emb = graft.Tables.embeddings(spark, sf001)
    val minLabel = emb.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(min("n")).collect()(0).getLong(0)
    val got168 = run("q168_label_balance").collect()
    assert(got168.map(_.getLong(1)).sum == emb.count())
    got168.foreach { r =>
      assert(r.getLong(2) == minLabel, s"q168 kept != minority count: $r")
      assert(r.getLong(3) == r.getLong(1) - minLabel, s"q168 dropped: $r")
    }
    // q169: every flagged hour satisfies the integer predicate with a
    // full-enough trailing frame, and the flag set is non-vacuous
    val got169 = run("q169_burst_detect").collect()
    assert(got169.nonEmpty, "q169 is vacuous — no bursts at sf0.001")
    got169.foreach { r =>
      val (cnt, ts, tn) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tn >= 3 && tn <= 5 && cnt * tn * 2 > ts * 3, s"q169: $r")
    }
  }

  test("q170–q173 round-10 batch-4 statistics hold their identities") {
    // q170: the weight ladder is exact — row i of a type carries
    // den = Σ_{k≤min(i,10)} 2^(10−k); the first row's ewma IS its count
    val got170 = run("q170_ewma_counts").collect()
    got170.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val srt = rows.sortBy(_.getTimestamp(1).getTime)
      srt.zipWithIndex.foreach { case (r, i) =>
        val expDen = (0 to math.min(i, 10)).map(k => 1L << (10 - k)).sum
        assert(r.getLong(4) == expDen, s"q170 den at row $i: $r")
        assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(4), s"q170 ewma: $r")
      }
      assert(srt.head.getDouble(5) == srt.head.getLong(2).toDouble, "q170 first ewma != cnt")
    }
    // q171: ρ reconstructs from (n, Σd²) and lands in [−1, 1+ε] (row_number
    // ranks of two orderings are permutations of 1..n, so Σd² ≤ the
    // reversed-permutation maximum n(n²−1)/3)
    run("q171_spearman").collect().foreach { r =>
      val (n, d2, rho) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d2 <= n * (n * n - 1) / 3, s"q171 d2 over max: $r")
      assert(rho == 1.0 - (6L * d2).toDouble / (n * (n * n - 1)), s"q171 identity: $r")
      assert(rho >= -1.0 && rho <= 1.0, s"q171 range: $r")
    }
    // q172: type masses cover the table; per-cell rounding slack bounds
    // total MI below by −(cells · 5e-5); cells ≤ 24 hours
    val got172 = run("q172_mutual_info").collect()
    assert(got172.map(_.getLong(2)).sum ==
      graft.Tables.events(spark, sf001).count())
    val totalCells = got172.map(_.getLong(1)).sum
    assert(got172.map(_.getDouble(3)).sum >= -(totalCells * 5e-5), "q172 MI < 0 beyond slack")
    got172.foreach(r => assert(r.getLong(1) <= 24, s"q172 cells: $r"))
    // q173: ranks are 1..n_sources, cum_docs ends at the corpus size,
    // cum_share is nondecreasing, and in_head80 is a monotone prefix
    val got173 = run("q173_pareto_coverage").collect().sortBy(_.getInt(0))
    val docs = graft.Tables.documents(spark, sf001)
    assert(got173.map(_.getInt(0)).sameElements(1 to got173.length))
    assert(got173.last.getLong(3) == docs.count(), "q173 cum_docs != corpus")
    got173.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(4), "q173 cum_share decreasing")
        assert(a.getBoolean(5) || !b.getBoolean(5), "q173 head flag not a prefix")
      case _ =>
    }
    assert(got173.head.getBoolean(5), "q173 top source must be in the head")
  }

  test("q174–q176 round-10 batch-5 distribution statistics hold") {
    // q174: frequency is non-increasing in rank, so the fitted slope is
    // negative (strictly, on any non-degenerate frequency table)
    run("q174_zipf_fit").collect().foreach { r =>
      assert(r.getLong(1) >= 2, s"q174 needs ≥2 points: $r")
      assert(r.getDouble(2) > 0, s"q174 sx: $r")
      val slope = r.getDouble(4)
      assert(!slope.isNaN && slope < 0, s"q174 slope must be negative: $r")
    }
    // q175: Cauchy-Schwarz (n·S2 ≥ S1²), positive mean, non-negative
    // variance and fano
    run("q175_fano_factor").collect().foreach { r =>
      val (n, s1, s2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n * s2 >= s1 * s1, s"q175 Cauchy-Schwarz: $r")
      assert(r.getDouble(4) > 0 && r.getDouble(5) >= 0 && r.getDouble(6) >= 0, s"q175: $r")
    }
    // q176: one row per event type; the split is interior; the score is
    // exactly |mean_before − mean_after|
    val got176 = run("q176_changepoint").collect()
    val nTypes = graft.Tables.events(spark, sf001)
      .select("event_type").distinct().count()
    assert(got176.length == nTypes, "q176 must pick one changepoint per type")
    got176.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) < r.getLong(3), s"q176 interior split: $r")
      assert(r.getDouble(6) == math.abs(r.getDouble(4) - r.getDouble(5)), s"q176 score: $r")
    }
  }

  test("q177–q179 Spark-4 surface queries hold their contracts") {
    val ev = graft.Tables.events(spark, sf001)
    // q177: the VARIANT path covers every event; distinct ≤ count; avg
    // reconstructs
    val got177 = run("q177_variant_json").collect()
    assert(got177.map(_.getLong(1)).sum == ev.count())
    got177.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"q177 distinct: $r")
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(1), s"q177 avg: $r")
    }
    // q178: the script's fixpoint — threshold is the MINIMAL power of two
    // whose clear-count ≤ 1000 (one step down must overshoot, unless the
    // loop never ran)
    val got178 = run("q178_sql_script").collect()
    val thr = got178.head.getDouble(1)
    val k = (math.log(thr) / math.log(2.0)).round
    assert(math.pow(2.0, k.toDouble) == thr, s"q178 threshold not a power of two: $thr")
    assert(got178.map(_.getLong(2)).sum <= 1000, "q178 clear-count over budget")
    if (thr > 1.0)
      assert(ev.where(col("value") >= thr / 2).count() > 1000,
        "q178 threshold not minimal — the loop overshot")
    // q179: every reported group average sits above the global average the
    // variable carried (all contributing rows do)
    run("q179_sql_variables").collect().foreach { r =>
      assert(r.getLong(2) >= 1 && r.getDouble(3) > r.getDouble(1), s"q179: $r")
    }
  }

  test("q180–q182 aggregate-surface queries hold their bounds") {
    val ev = graft.Tables.events(spark, sf001)
    // q180: user masses cover the distinct users; active hours in [1, 24]
    val got180 = run("q180_hour_bitmask").collect()
    assert(got180.map(_.getLong(1)).sum == ev.select("user_id").distinct().count())
    got180.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 24, s"q180: $r")
    }
    // q181: per-type estimates and the merged union within 6.5% (~4 sigma
    // at lgK=12's rsd ≈ 1.6%; 5% was ~3 sigma across 7 estimates — a rare
    // spurious miss on regenerated data was possible with no code change;
    // same envelope the parity gate enforces)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("ALL" -> ev.select("user_id").distinct().count())
    val got181 = run("q181_hll_union").collect()
    assert(got181.map(_.getString(0)).toSet == exact.keySet, "q181 groups")
    got181.foreach { r =>
      val (k, e) = (r.getString(0), r.getLong(1))
      val x = exact(k)
      assert(x > 0 && math.abs(e - x).toDouble / x <= 0.065, s"q181 $k: est=$e exact=$x")
    }
    // q182: bucket masses cover the orders table; buckets within the
    // SQL-spec range [0, 21]
    val got182 = run("q182_width_bucket").collect()
    assert(got182.map(_.getLong(1)).sum == graft.Tables.orders(spark, sf001).count())
    got182.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) <= 21, s"q182: $r"))
  }

  test("q183–q185 split/collation/null-safe-join queries hold their bounds") {
    val docs = graft.Tables.documents(spark, sf001)
    // q183: the manifest partitions the corpus; all three splits exist;
    // the train share is near its 80% target (hash-binomial slack)
    val got183 = run("q183_train_val_split").collect()
    assert(got183.map(_.getLong(2)).sum == docs.count())
    val bySplit = got183.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit.keySet == Set("train", "val", "test"), s"q183 splits: ${bySplit.keySet}")
    val trainShare = bySplit("train").toDouble / docs.count()
    assert(trainShare > 0.65 && trainShare < 0.95, s"q183 train share $trainShare")
    // q184: collated groups cover the corpus at the clean-lang cardinality
    // (case variants merged); emitted keys are lowercase
    val got184 = run("q184_collated_group").collect()
    assert(got184.map(_.getLong(1)).sum == docs.count())
    assert(got184.length == docs.select("lang").distinct().count().toInt,
      "q184 collation failed to merge case variants")
    got184.foreach { r =>
      assert(r.getString(0) == r.getString(0).toLowerCase, s"q184 key case: $r")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 2, s"q184 variants: $r")
    }
    // q185: each band's pair count is exactly C(n, 2) of the carved band
    // size — including the NULL band a plain equi-join would drop
    val carve = graft.Tables.orders(spark, sf001)
      .where(col("o_orderkey") % 100 === 0)
      .select(when(col("o_totalprice") < 50000, "low")
        .when(col("o_totalprice") >= 300000, "high").otherwise("NULL_BAND").as("band"))
      .groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got185 = run("q185_null_safe_join").collect()
    got185.foreach { r =>
      val n = carve(r.getString(0))
      assert(r.getLong(1) == n * (n - 1) / 2, s"q185 triangular identity: $r (n=$n)")
    }
    assert(got185.map(_.getString(0)).contains("NULL_BAND"),
      "q185 must exercise the NULL band")
  }

  test("q186–q189 salted-join/Welch/decontam/parameterized-SQL invariants") {
    // q186: the salt is result-invisible — the salted join reproduces the
    // plain (unsalted) join + group bit-for-bit (the q67 discipline,
    // join-side). This is the Spark-internal twin of the DuckDB oracle.
    val weights = Map("click" -> 1.5, "view" -> 0.2, "purchase" -> 9.0,
      "signup" -> 3.0, "error" -> 0.0)
    val plain = graft.Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * lit(1e9))).as("svq"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2).toDouble / 1e9 * weights(r.getString(0))))
      .toMap
    val got186 = run("q186_skew_join_salted").collect()
    assert(got186.length == 5, s"q186 types: ${got186.length}")
    got186.foreach { r =>
      val (n, wv) = plain(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == wv,
        s"q186 salt visibility: $r vs ($n, $wv)")
    }
    // q187: single row; t finite; Welch–Satterthwaite df sits inside its
    // analytic bounds [min(n)-1, n1+n2-2]; the quantized mean tracks the
    // raw double mean to the 1e-6 quantum.
    val got187 = run("q187_welch_ttest").collect()
    assert(got187.length == 1)
    val r187 = got187.head
    val (n1, n2) = (r187.getLong(0), r187.getLong(1))
    val df = r187.getDouble(5)
    assert(!df.isNaN && !r187.getDouble(4).isNaN, s"q187 NaN: $r187")
    assert(df >= math.min(n1, n2) - 1 && df <= n1 + n2 - 2, s"q187 df: $r187")
    val rawMeanO = graft.Tables.orders(spark, sf001)
      .where(col("o_orderstatus") === "O")
      .agg(avg("o_totalprice")).collect().head.getDouble(0)
    assert(math.abs(r187.getDouble(2) - rawMeanO) < 1e-4,
      s"q187 mean_open ${r187.getDouble(2)} vs raw $rawMeanO")
    // q188: candidates exclude the benchmark carve exactly; rates bounded;
    // contamination is monotone — every flagged doc really shares a gram
    // (parity proves it cross-engine; here lock the partition identity).
    val docs188 = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 8)
    val candByLang = docs188.where(col("doc_id") % 50 =!= 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got188 = run("q188_ngram_decontam").collect()
    got188.foreach { r =>
      assert(r.getLong(1) == candByLang(r.getString(0)), s"q188 carve: $r")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1), s"q188 bound: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"q188 rate: $r")
    }
    // q189: IDENTIFIER + parameter markers resolve to the same result as
    // the direct DataFrame aggregation.
    val direct189 = graft.Tables.documents(spark, sf001)
      .where(col("n_chars") >= 200)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got189 = run("q189_identifier_param").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got189.toSeq == direct189.toSeq, "q189 parameterized != direct")
    // q190: nonneg TF-IDF weights ⇒ cosine ∈ [0, 1] (+ half-ulp); ranks
    // dense 1..k per doc; no self-neighbors; every doc in the carve with
    // a nonzero vector appears
    val got190 = run("q190_sparse_cosine_topk").collect()
    assert(got190.nonEmpty)
    got190.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        s"q190 ranks not dense for doc $id")
      rows.foreach { r =>
        assert(r.getLong(2) != id, s"q190 self-neighbor: $r")
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-12,
          s"q190 cosine out of range: $r")
      }
    }
  }

  test("q191–q192 padding-waste/Gram-matrix invariants") {
    // q191: the ladder partitions the corpus exactly — caps are from the
    // declared rung set, max fits its cap, waste is the stated identity
    // and nonnegative, shares are proper fractions, and the bucket doc
    // counts re-add to the corpus size.
    val got191 = run("q191_padding_waste").collect()
    val rungs = Set(16, 32, 64, 128)
    got191.foreach { r =>
      val (cap, n, sum, mx, waste, share) = (r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(rungs.contains(cap), s"q191 cap: $r")
      assert(mx <= cap && waste == cap * n - sum && waste >= 0, s"q191: $r")
      assert(share >= 0.0 && share < 1.0, s"q191 share: $r")
    }
    val totalDocs = graft.Tables.documents(spark, sf001).count()
    assert(got191.map(_.getLong(2)).sum == totalDocs, "q191 partition")
    // q192: dense upper triangle (D(D+1)/2 cells), nonnegative diagonal,
    // Cauchy–Schwarz off-diagonal bound, and the (0,0) cell re-derived by
    // a direct second-moment aggregation over the same quantization.
    val got192 = run("q192_embedding_gram").collect()
    assert(got192.length == 64 * 65 / 2, s"q192 cells: ${got192.length}")
    val g = got192.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    g.foreach { case ((i, j), v) =>
      assert(i <= j, s"q192 triangle: ($i,$j)")
      if (i == j) assert(v >= 0.0, s"q192 diag: ($i,$j)=$v")
      else assert(v * v <= g((i, i)) * g((j, j)) * (1 + 1e-9),
        s"q192 Cauchy–Schwarz: ($i,$j)")
    }
    val direct00 = graft.Tables.embeddings(spark, sf001)
      .select(expr("CAST(FLOOR(CAST(embedding[0] AS DOUBLE) * 1e6) AS BIGINT)")
        .as("q0"))
      .agg(sum(col("q0") * col("q0")).as("s"), count(lit(1)).as("n"))
      .select(col("s").cast("double") / lit(1e12) / col("n"))
      .collect().head.getDouble(0)
    assert(g((0, 0)) == direct00, s"q192 (0,0): ${g((0, 0))} vs $direct00")
  }

  test("q193–q198 stats/curation invariants") {
    // q193: interpolated values sit inside the bracketing observations;
    // observed rows echo their own value (had_obs=1 → non-null).
    val g193 = run("q193_linear_interp").collect()
    g193.foreach { r =>
      val hadObs = r.getInt(2)
      if (hadObs == 1) assert(!r.isNullAt(3), s"q193 obs null: $r")
    }
    // per user: edge rows (before first / after last obs) are null, and
    // every non-null interp is within the user's observed value range.
    g193.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val obsVals = rows.filter(_.getInt(2) == 1).map(_.getDouble(3))
      if (obsVals.nonEmpty) {
        val (lo, hi) = (obsVals.min, obsVals.max)
        rows.filter(r => r.getInt(2) == 0 && !r.isNullAt(3)).foreach { r =>
          val v = r.getDouble(3)
          assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"q193 range: $r")
        }
      }
    }
    // q194: confusion table partitions the corpus; po/pe proper; kappa ≤ 1.
    val k = run("q194_cohen_kappa").collect().head
    val (n, n11, n10, n01, n00) = (k.getLong(0), k.getLong(1), k.getLong(2),
      k.getLong(3), k.getLong(4))
    assert(n11 + n10 + n01 + n00 == n, s"q194 partition: $k")
    val (po, pe) = (k.getDouble(5), k.getDouble(6))
    assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0, s"q194 p: $k")
    if (!k.isNullAt(7)) assert(k.getDouble(7) <= 1.0 + 1e-12, s"q194 kappa: $k")
    // q195: joint counts re-add to both marginals and the total.
    val g195 = run("q195_mutual_info").collect()
    val tot195 = g195.head.getLong(5)
    assert(g195.map(_.getLong(2)).sum == tot195, "q195 total")
    g195.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum == rows.head.getLong(3), "q195 n_x")
    }
    g195.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum == rows.head.getLong(4), "q195 n_y")
    }
    // q196: 13 lags, each |r| ≤ 1 (Cauchy–Schwarz), and every overlap is
    // bounded by the smaller series' observed-hour count (lag 0 need NOT
    // be maximal under observed-hours semantics: on sparse grids a
    // shifted alignment can match more hours).
    val g196 = run("q196_xcorr_lag").collect()
    assert(g196.length == 13, s"q196 lags: ${g196.length}")
    g196.foreach { r =>
      if (!r.isNullAt(2))
        assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12, s"q196 r: $r")
    }
    val ev = graft.Tables.events(spark, sf001)
    val hourCap = math.min(
      ev.where(col("event_type") === "click")
        .select(date_trunc("hour", col("ts"))).distinct().count(),
      ev.where(col("event_type") === "purchase")
        .select(date_trunc("hour", col("ts"))).distinct().count())
    g196.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= hourCap, s"q196 overlap: $r")
    }
    // q197: quotas sum EXACTLY to the budget; each seat adjustment ∈ {0,1};
    // ranks are a permutation of 1..#strata.
    val g197 = run("q197_quota_apportion").collect()
    assert(g197.map(_.getLong(6)).sum == 10000L, "q197 budget")
    g197.foreach { r =>
      val d = r.getLong(6) - r.getLong(3)
      assert(d == 0L || d == 1L, s"q197 seat: $r")
    }
    assert(g197.map(_.getInt(5)).sorted.toSeq == (1 to g197.length),
      "q197 rank permutation")
    // q198: top-20 by the declared total order; n_occ ≥ df ≥ 1;
    // df_share = df / #docs exactly.
    val g198 = run("q198_repeated_ngrams").collect()
    assert(g198.length <= 20, s"q198 rows: ${g198.length}")
    val nDocs = graft.Tables.documents(spark, sf001).count()
    g198.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(1) >= 1, s"q198: $r")
      assert(r.getDouble(4) == r.getLong(1).toDouble / nDocs, s"q198 share: $r")
    }
    val keys = g198.map(r => (-r.getLong(1), -r.getLong(2), r.getString(0)))
    assert(keys.sameElements(keys.sorted), "q198 order")
  }

  test("q199–q200 infrastructure-audit invariants") {
    // q199: the consistent ring's whole point — growing 8→9 shards moves
    // FAR less than modular resharding; both shares are proper fractions
    // and the counts partition correctly.
    val m = run("q199_shard_move").collect().head
    val (nd, mr, mm) = (m.getLong(0), m.getLong(1), m.getLong(2))
    assert(nd == graft.Tables.documents(spark, sf001).count(), "q199 n_docs")
    assert(mr <= nd && mm <= nd && mr < mm, s"q199 movement: $m")
    assert(m.getDouble(3) == mr.toDouble / nd && m.getDouble(4) == mm.toDouble / nd,
      s"q199 shares: $m")
    // q200: the fixture's props is always '{"k": <int>}' — so every event
    // is hit, each has exactly one digit run, and redaction collapses each
    // type's payload space to exactly ONE template.
    val g200 = run("q200_redaction").collect()
    assert(g200.nonEmpty)
    g200.foreach { r =>
      val (n, hit, runs, masked, tpl) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(hit == n && runs == n, s"q200 coverage: $r")
      assert(masked >= n, s"q200 masked chars: $r") // ≥1 digit per event
      assert(tpl == 1L, s"q200 template collapse: $r")
    }
  }

  test("q201–q202 asof-tolerance/DQ-suite invariants") {
    // q201: the tolerance path is EXACTLY q64's plain as-of answer with
    // the >1-hour attributions nulled — never a different click.
    val plain = run("q64_asof_native").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getTimestamp(3).getTime)))
      .toMap
    val g201 = run("q201_asof_tolerance").collect()
    assert(g201.length == plain.size, "q201 row count != q64")
    g201.foreach { r =>
      val ts = r.getTimestamp(2).getTime
      val attributed = r.getInt(4)
      if (!r.isNullAt(3)) {
        val a = r.getTimestamp(3).getTime
        assert(attributed == 1 && plain(r.getLong(0)).contains(a), s"q201: $r")
        assert(ts - a >= 0 && ts - a <= 3600L * 1000, s"q201 window: $r")
      } else {
        assert(attributed == 0, s"q201 flag: $r")
        plain(r.getLong(0)).foreach { a =>
          assert(ts - a > 3600L * 1000, s"q201 should have attributed: $r vs $a")
        }
      }
    }
    // q202: the fixture is clean — every constraint passes with zero
    // violations, and n_checked matches the audited tables.
    val g202 = run("q202_dq_suite").collect()
    assert(g202.length == 6, s"q202 rows: ${g202.length}")
    val nOrders = graft.Tables.orders(spark, sf001).count()
    val nLineitem = graft.Tables.lineitem(spark, sf001).count()
    g202.foreach { r =>
      assert(r.getLong(2) == 0L && r.getInt(3) == 1, s"q202 violation: $r")
      val expectN = if (r.getString(0).startsWith("orders")) nOrders else nLineitem
      assert(r.getLong(1) == expectN, s"q202 n_checked: $r")
    }
  }

  test("q203–q204 reconciliation/bootstrap invariants") {
    // q203: the outcome classes partition each status's orders exactly,
    // totals cover the orders table, and the headers-without-lines count
    // matches an independent anti-join.
    val g203 = run("q203_order_reconcile").collect()
    val o = graft.Tables.orders(spark, sf001)
    val li = graft.Tables.lineitem(spark, sf001)
    assert(g203.map(_.getLong(1)).sum == o.count(), "q203 total orders")
    g203.foreach { r =>
      val (n, noL, ex, wc, off) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(noL + ex + wc + off == n, s"q203 partition: $r")
    }
    val noLinesIndep = o.join(li.select(col("l_orderkey")).distinct(),
      col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(g203.map(_.getLong(2)).sum == noLinesIndep, "q203 no_lines")
    // q204: 64 replicates; each effective n concentrates around the true
    // n (Poisson(1) per row ⇒ sd = √n); each resample mean lies inside
    // the data's value range; replicate 0 re-derives exactly through an
    // independent spelling of the hash ladder.
    val g204 = run("q204_bootstrap_ci").collect()
    assert(g204.length == 64, s"q204 replicates: ${g204.length}")
    val nO = o.count()
    val bound = 6 * math.sqrt(nO.toDouble) + 10
    g204.foreach { r =>
      assert(math.abs(r.getLong(1) - nO) <= bound, s"q204 n_eff: $r vs $nO")
    }
    val range = o.agg(min("o_totalprice"), max("o_totalprice")).collect().head
    g204.foreach { r =>
      val m = r.getDouble(2)
      assert(m >= range.getDouble(0) - 1 && m <= range.getDouble(1) + 1,
        s"q204 mean range: $r")
    }
    val b0 = o.selectExpr("CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents",
        """CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '#0')),
          |1, 15), 16, 10) AS BIGINT) % 100000 AS u""".stripMargin)
      .selectExpr("cents",
        """CASE WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
          |WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3 WHEN u < 99634 THEN 4
          |WHEN u < 99941 THEN 5 WHEN u < 99992 THEN 6 ELSE 7 END AS w""".stripMargin)
      .selectExpr("CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100 AS m")
      .collect().head.getDouble(0)
    val got0 = g204.find(_.getInt(0) == 0).get.getDouble(2)
    assert(got0 == b0, s"q204 b=0: $got0 vs $b0")
  }

  test("q217–q218 prune audit + bloom FPR invariants") {
    // q217: both layouts score all 8 predicates, matched ≤ scanned, and
    // the date-range layout dominates the key layout on EVERY predicate
    // (fewer rows scanned, no worse efficiency) — the audit's point.
    val g217 = run("q217_prune_audit").collect()
    assert(g217.length == 16, s"q217 rows: ${g217.length}")
    g217.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3) &&
        r.getDouble(5) == r.getLong(4).toDouble / r.getLong(3),
        s"q217 row: $r")
    }
    val byPred = g217.groupBy(_.getLong(1))
    assert(byPred.size == 8)
    byPred.foreach { case (p, rows) =>
      val key = rows.find(_.getString(0) == "key").get
      val date = rows.find(_.getString(0) == "date").get
      assert(date.getLong(3) <= key.getLong(3) &&
        date.getDouble(5) >= key.getDouble(5),
        s"q217 date layout not dominant at pred $p")
    }
    // q218: FPR is monotone nonincreasing in filter size, set bits are
    // bounded by both the filter and 3 probes per key, and the m=16×
    // filter is far below the saturated small filter's FPR.
    val g218 = run("q218_bloom_fpr").collect().sortBy(_.getLong(0))
    assert(g218.map(_.getLong(0)).toSeq == Seq(1024L, 4096L, 16384L))
    g218.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2) &&
        r.getLong(3) <= math.min(r.getLong(0), 3 * r.getLong(1)) &&
        r.getDouble(5) >= 0 && r.getDouble(5) <= 1, s"q218 row: $r")
    }
    val fprs = g218.map(_.getDouble(5))
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a >= b },
      s"q218 fpr monotone: ${fprs.toSeq}")
    assert(fprs.last < fprs.head, "q218 size has no effect")
  }

  test("q215–q216 seasonal profile/drift invariants") {
    val nEvents = graft.Tables.events(spark, sf001).count()
    // q215: ≤168 cells over the (dow, hr) grid, counts re-add to the
    // corpus, and load_ratio is exactly n·168/total per cell.
    val g215 = run("q215_seasonal_profile").collect()
    assert(g215.length <= 168 &&
      g215.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 7 &&
        r.getLong(1) >= 0 && r.getLong(1) < 24))
    assert(g215.map(_.getLong(2)).sum == nEvents, "q215 partition")
    g215.foreach { r =>
      assert(r.getDouble(4) == r.getLong(2) * 168.0 / nEvents,
        s"q215 load ratio: $r")
    }
    // q216: the two halves partition the stream, shares are the exact
    // per-half quotients, drift is their absolute difference.
    val g216 = run("q216_seasonal_drift").collect()
    val (t0, t1) = (g216.map(_.getLong(2)).sum, g216.map(_.getLong(3)).sum)
    assert(t0 + t1 == nEvents, "q216 half partition")
    assert(t0 > 0 && t1 > 0, "q216 degenerate split")
    g216.foreach { r =>
      assert(r.getDouble(4) == r.getLong(2).toDouble / t0 &&
        r.getDouble(5) == r.getLong(3).toDouble / t1 &&
        r.getDouble(6) == math.abs(r.getDouble(4) - r.getDouble(5)),
        s"q216 share identity: $r")
    }
  }

  test("q213–q214 DP release + skew audit invariants") {
    // q213: release identity n_dp = n_true + k, |k| ≤ 8 (ladder clamp),
    // true counts re-add to the corpus, and the noise concentrates the
    // way a two-sided geometric must (most draws within ±2).
    val g213 = run("q213_dp_release").collect()
    val nDocs = graft.Tables.documents(spark, sf001).count()
    assert(g213.map(_.getLong(2)).sum == nDocs, "q213 true partition")
    g213.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3) &&
        r.getLong(5) == math.abs(r.getLong(3)) && r.getLong(5) <= 8,
        s"q213 release identity: $r")
    }
    assert(g213.count(_.getLong(5) <= 2) * 10 >= g213.length * 6,
      "q213 noise not concentrated")
    // q214: the predicted per-bucket output rows re-add to the EXACT
    // join cardinality, buckets live in [0, 32), and key counts re-add
    // to the overlapping-key count.
    val g214 = run("q214_skew_audit").collect()
    val ev = graft.Tables.events(spark, sf001)
    val ord = graft.Tables.orders(spark, sf001)
    val joinRows = ev.join(ord, ev("user_id") === ord("o_custkey")).count()
    assert(g214.map(_.getLong(4)).sum == joinRows, "q214 output prediction")
    val nKeys = ev.select("user_id").distinct()
      .join(ord.select("o_custkey").distinct(),
        org.apache.spark.sql.functions.col("user_id") ===
          org.apache.spark.sql.functions.col("o_custkey")).count()
    assert(g214.map(_.getLong(1)).sum == nKeys, "q214 key partition")
    assert(g214.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 32))
  }

  test("q211–q212 BPE train/apply invariants") {
    // q211: classic BPE properties — the winning pair count never
    // increases across rounds (merges only remove or bound pair mass),
    // the corpus segment count strictly decreases by at least the
    // merged occurrences, and never drops below one segment per word.
    val g211 = run("q211_bpe_train").collect().sortBy(_.getInt(0))
    assert(g211.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val pairNs = g211.map(_.getLong(3))
    assert(pairNs.zip(pairNs.tail).forall { case (a, b) => a >= b },
      s"q211 max-pair monotone: ${pairNs.toSeq}")
    val segs = g211.map(_.getLong(4))
    assert(segs.zip(segs.tail).forall { case (a, b) => a > b },
      s"q211 segment decrease: ${segs.toSeq}")
    val nTokens = graft.Tables.documents(spark, sf001)
      .selectExpr("size(split(text, ' ')) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(segs.last >= nTokens, "q211 below one segment per word")
    // q212: stratum word counts re-add to the corpus token count, and
    // fertility = segments/words ≥ 1 everywhere.
    val g212 = run("q212_bpe_apply").collect()
    assert(g212.map(_.getLong(2)).sum == nTokens, "q212 word partition")
    g212.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2) &&
        r.getDouble(4) == r.getLong(3).toDouble / r.getLong(2),
        s"q212 fertility: $r")
    }
  }

  test("q209–q210 bigram-NLL + Markov-stationary invariants") {
    // q209: one row per (≥2-token) doc, n_bigrams = n_tokens − 1 exactly,
    // NLL positive (p < 1 for every smoothed bigram), avg = sum/n.
    val g209 = run("q209_bigram_nll").collect()
    val tokCounts = graft.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(g209.length == tokCounts.count(_._2 >= 2), "q209 doc coverage")
    g209.foreach { r =>
      assert(r.getLong(2) == tokCounts(r.getLong(0)) - 1L,
        s"q209 bigram count: $r")
      assert(r.getDouble(3) > 0 &&
        r.getDouble(4) == r.getDouble(3) / r.getLong(2), s"q209 nll: $r")
    }
    // q210: states are event types, masses nonnegative, and the total
    // ppm mass stays within the documented integer-floor loss of 1e6
    // (≤ |S| ppm per quantized matrix row + ≤ |S| per DIV step).
    val g210 = run("q210_markov_stationary").collect()
    val types = graft.Tables.events(spark, sf001)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(g210.nonEmpty && g210.forall(r => types.contains(r.getString(0))))
    val tot = g210.map(_.getLong(1)).sum
    assert(g210.forall(_.getLong(1) >= 0) &&
      tot <= 1000000L && tot >= 999000L, s"q210 mass: $tot")
  }

  test("q207–q208 fold-leakage + curriculum invariants") {
    val nDocs = graft.Tables.documents(spark, sf001).count()
    // q207: folds partition both docs and clusters; the cluster-aware
    // assignment leaks nothing by construction, and the naive-leak count
    // is bounded by the naive fold's doc count.
    val g207 = run("q207_fold_leakage").collect()
    assert(g207.map(_.getLong(0)).toSet.subsetOf((0L to 4L).toSet))
    assert(g207.map(_.getLong(1)).sum == nDocs, "q207 aware partition")
    assert(g207.map(_.getLong(4)).sum == nDocs, "q207 naive partition")
    g207.foreach { r =>
      assert(r.getLong(5) <= r.getLong(4), s"q207 leak bound: $r")
    }
    // the corpus genuinely exercises the audit: clusters exist with >1
    // doc, and naive hashing leaks at least one of them
    assert(g207.map(_.getLong(2)).sum < nDocs, "q207 singleton-only corpus")
    assert(g207.map(_.getLong(5)).sum > 0, "q207 nothing to audit")
    // q208: buckets in [0,100], doc counts re-add to the corpus, ppm in
    // [0,1e6], per-bucket min/max consistent with the bucket bounds, and
    // the cumulative budget is strictly increasing ending at Σ tot_tokens.
    val g208 = run("q208_curriculum").collect().sortBy(_.getLong(0))
    assert(g208.map(_.getLong(1)).sum == nDocs, "q208 partition")
    g208.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(b >= 0 && b <= 100 && mn >= 0 && mx <= 1000000 && mn <= mx,
        s"q208 domain: $r")
      assert(mn / 10000 == b && mx / 10000 == b, s"q208 bucket edges: $r")
    }
    val cums = g208.map(_.getLong(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b },
      "q208 cum monotone")
    assert(cums.last == g208.map(_.getLong(2)).sum, "q208 cum total")
  }

  test("q205–q206 product-quantization invariants") {
    // q205: every subspace's code counts re-add to the corpus size, codes
    // live in [0, 16), SSE is nonnegative, and at most 8×16 cells exist.
    val g205 = run("q205_pq_train").collect()
    assert(g205.length <= 128, s"q205 cells: ${g205.length}")
    val nVecs = graft.Tables.embeddings(spark, sf001).count()
    g205.groupBy(_.getInt(0)).foreach { case (s, rows) =>
      assert(rows.map(_.getLong(2)).sum == nVecs, s"q205 partition s=$s")
    }
    g205.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 16 && r.getLong(3) >= 0,
        s"q205: $r")
    }
    // q206: exactly 5 ranked neighbors per query, rank-dense, ADC
    // distances nondecreasing in rank, never the query itself.
    val g206 = run("q206_pq_adc").collect()
    val byQ = g206.groupBy(_.getLong(0))
    assert(byQ.size == math.min(10L, nVecs).toInt, s"q206 queries: ${byQ.size}")
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length),
        s"q206 rank density qid=$qid")
      assert(sorted.forall(_.getLong(1) != qid), s"q206 self-match qid=$qid")
      val dists = sorted.map(_.getLong(2))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
        s"q206 monotone qid=$qid")
    }
  }
}

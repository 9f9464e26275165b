package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 additions. Locked here:
  *  1. q254's capacity→quality curve has the operating shape that makes
  *     it a tuning table: training SSE strictly FALLS as kc rises
  *     (capacity buys resolution), mean re-ranked recall@5 is monotone
  *     non-decreasing, and the curve is non-vacuous (kc=16 leaves real
  *     recall on the table that kc=256 recovers).
  *  2. q247's DECIMAL accumulator leg — the documented remedy for cells
  *     past the ~1.4e5-member int64 bound — is BIT-EQUAL to the declared
  *     long form at gate scale (they overlap everywhere below the bound),
  *     so the remedy is proven, not named (round-13 ADVICE #5 residue).
  */
class Round15Spec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  test("q254: SSE strictly falls with kc; mean recall monotone non-decreasing and non-vacuous") {
    val rows = SparkEntry.queries("q254_pq_capacity_curve")(spark, sf01)
      .collect()
      .map(r => (r.getAs[Long]("kc"), r.getAs[Long]("n_hit"), r.getAs[Long]("sse")))
    val byKc = rows.groupBy(_._1).toSeq.sortBy(_._1)
    assert(byKc.map(_._1) == ops.Round15.kcLevels.map(_.toLong),
      "curve levels drifted from Round15.kcLevels")
    // every level covers every query (10 queries × 3 levels = 30 rows)
    assert(rows.length == 30, s"expected 30 (qid × kc) rows, got ${rows.length}")
    // SSE is one number per level (repeated per qid) and strictly falls:
    // more centroids per subspace never quantize worse on this contract
    val sse: Seq[Long] = byKc.map { case (_, g) =>
      val d = g.map(_._3).distinct
      assert(d.length == 1, s"sse not constant within a level: ${d.toSeq}")
      d.head
    }
    assert(sse.zip(sse.tail).forall { case (hi, lo) => hi > lo },
      s"training SSE not strictly decreasing in kc: $sse")
    // mean recall (Σ n_hit per level / 50) monotone non-decreasing; the
    // per-QUERY recall is deliberately NOT locked (levels train separate
    // codebooks — individual queries can dip, measured at sf0.01)
    val hits = byKc.map { case (_, g) => g.map(_._2).sum }
    assert(hits == hits.sorted,
      s"mean recall not monotone in kc: hits/level = $hits")
    // non-vacuity: the knob must have something to buy and buy it
    assert(hits.head < 50, "kc=16 already exact — the curve is vacuous here")
    assert(hits.last > hits.head, "capacity bought no recall")
  }

  test("q247: DECIMAL(38,0) accumulator leg == the declared int64 form, bit-for-bit") {
    def run(decimalAcc: Boolean) =
      ops.Round13b.cellSilhouette(spark, sf01, decimalAcc = decimalAcc)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"),
          (r.getAs[Long]("own_list"), r.getAs[Any]("a"), r.getAs[Any]("b"),
            r.getAs[Double]("silhouette"))))
        .toMap
    val longForm = run(decimalAcc = false)
    val decForm = run(decimalAcc = true)
    assert(longForm.nonEmpty, "empty carve — the comparison is vacuous")
    assert(decForm.keySet == longForm.keySet)
    longForm.foreach { case (id, lv) =>
      assert(decForm(id) == lv,
        s"vec $id diverges: long=$lv decimal=${decForm(id)} — the DECIMAL " +
          "remedy would NOT be a drop-in past the int64 bound")
    }
  }
}

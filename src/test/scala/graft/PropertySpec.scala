package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Event

/** Generative property tests (SURVEY.md §5.3): operator semantics hold
  * for ARBITRARY inputs, not just the fixture corpus. Each property runs
  * the real Spark operator on ScalaCheck-generated data and checks it
  * against independently-computed Scala ground truth. (Plain ScalaCheck
  * generators driven with fixed seeds — deterministic, and no extra
  * bridge dependency needed.)
  */
class PropertySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(42L + i)).get)

  private val genEvents: Gen[List[Event]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      uid <- Gen.choose(0L, 3L)
      minute <- Gen.choose(0, 6000)
      typ <- Gen.oneOf("click", "purchase", "view")
      v <- Gen.choose(0, 20000).map(_ / 100.0)
    } yield (uid, minute, typ, v))
  } yield evs.zipWithIndex.map { case ((uid, minute, typ, v), i) =>
    Event(i.toLong, new Timestamp(1700000000000L + minute * 60000L), uid, typ, v, "{}")
  }

  test("property: session_window count per user == 1 + #gaps >= 30min") {
    samples(genEvents, 8).foreach { evs =>
      val sessions = evs.toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)))
        .groupBy("user_id").count()
        .as[(Long, Long)].collect().toMap

      val expected = evs.groupBy(_.user_id).map { case (uid, es) =>
        val times = es.map(_.ts.getTime).sorted
        val gaps = times.sliding(2).count {
          case Seq(a, b) => b - a >= 30L * 60 * 1000
          case _         => false
        }
        uid -> (gaps + 1L)
      }
      assert(sessions == expected, s"events: $evs")
    }
  }

  test("property: row_number dedup keeps exactly the (ts, event_id)-min row per key") {
    samples(genEvents, 8).foreach { evs =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val kept = evs.toDF().withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("event_id").as[Long].collect().toSet

      val expected = evs.groupBy(e => (e.user_id, e.event_type)).values
        .map(_.minBy(e => (e.ts.getTime, e.event_id)).event_id).toSet
      assert(kept == expected, s"events: $evs")
    }
  }

  test("property: Jaccard via array ops is symmetric, bounded, and 1 iff equal sets") {
    val vocab = ('a' to 'z').map(_.toString).toList
    val genPair = for {
      a <- Gen.nonEmptyListOf(Gen.oneOf(vocab))
      b <- Gen.nonEmptyListOf(Gen.oneOf(vocab))
    } yield (a.distinct, b.distinct)

    samples(genPair, 20).foreach { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          (size(array_intersect(col("a"), col("b"))).cast("double") /
            size(array_union(col("a"), col("b")))).as("j_ab"),
          (size(array_intersect(col("b"), col("a"))).cast("double") /
            size(array_union(col("b"), col("a")))).as("j_ba")
        ).collect()(0)
      val (jab, jba) = (row.getDouble(0), row.getDouble(1))
      assert(jab == jba)
      assert(jab >= 0.0 && jab <= 1.0)
      assert((jab == 1.0) == (a.toSet == b.toSet), s"a=$a b=$b j=$jab")
    }
  }

  test("property: distributed prefix-scan == sequential running max, any bucket count") {
    val genRows: Gen[List[(Long, Long, Double)]] = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 499L) // order key WITH duplicates
        v <- Gen.choose(-10000, 10000).map(_ / 100.0)
      } yield (a, v))
    } yield rows.zipWithIndex.map { case ((a, v), i) => (i.toLong, a, v) }
    for ((rows, buckets) <- samples(genRows, 6).zip(Seq(1, 2, 7, 16, 50, 500))) {
      val df = rows.toDF("id", "a", "v")
      val got = ops.Scan.runningMaxByRange(
        df, col("a"), col("id"), col("v"), "rm", lo = 0L, hi = 500L, buckets = buckets)
        .select("id", "rm").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // ground truth: sequential scan in (a, id) order
      var mx = Double.NegativeInfinity
      val want = rows.sortBy(t => (t._2, t._1)).map { case (id, _, v) =>
        mx = math.max(mx, v); id -> mx
      }.toMap
      assert(got == want, s"buckets=$buckets n=${rows.size}")
    }
  }

  test("property: bucketed interval self-join == naive all-pairs, any width") {
    // duplicates in (user, us) allowed: us_b > us_a keeps ties unpaired on
    // both sides, so equality still holds
    val genRows: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        uid <- Gen.choose(0L, 2L)
        us <- Gen.choose(0L, 5000L)
      } yield (uid, us))
    } yield rows
    for ((rows, w) <- samples(genRows, 5).zip(Seq(1L, 7L, 100L, 1000L, 10000L))) {
      val got = ops.Curation2.intervalSelfJoinPairs(rows.toDF("user_id", "us"), w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val want = for {
        (ua, ta) <- rows
        (ub, tb) <- rows
        if ua == ub && tb > ta && tb - ta <= w
      } yield (ua, ta, tb)
      // multiset compare: exactly-once matching is the whole claim
      assert(got.sorted == want.sorted, s"w=$w n=${rows.size}")
    }
  }

  test("property: native DotProduct equals a Scala-side sequential fold") {
    val genVec = Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 250.0))
    val pairs = samples(genVec, 20).zip(samples(genVec, 20).reverse)
    val got = pairs.toDF("a", "b")
      .select(plans.DotProduct.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      var acc = 0.0
      a.zip(b).foreach { case (x, y) => acc += x * y }
      assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(acc))
    }
  }
}

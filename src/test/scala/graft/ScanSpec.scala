package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scan

/** The distributed prefix-scan (ops/Scan.scala) — scale-safe replacement
  * for q37's global-window running max, the last unmitigated
  * single-partition construct. Locked here:
  *  1. bit-identical results to the single-window form on synthetic data
  *     with duplicate order keys (ties cross bucket-internal ordering);
  *  2. lateEventsScalable == q37 exactly on the real events table;
  *  3. plan shape: every Window with an EMPTY partition spec sits above an
  *     Aggregate (i.e. operates on the bucket-reduced carry frame, at most
  *     `buckets` rows) — never directly over the event scan.
  */
class ScanSpec extends AnyFunSuite {
  import SharedSpark.{sf001, sf01, spark}

  test("runningMaxByRange == single global window, with order-key ties") {
    val df = spark.range(10000).select(
      col("id"),
      ((col("id") * 48271) % 997).as("a"),      // order key WITH duplicates
      ((col("id") * 16807) % 10007).cast("double").as("v"))
    val got = Scan.runningMaxByRange(df, col("a"), col("id"), col("v"),
      "rm", lo = 0L, hi = 997L, buckets = 16)
      .select("id", "rm")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = Window.orderBy("a", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("rm", max(col("v")).over(w))
      .select("id", "rm")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 10000 && got == want)
  }

  test("runningSumsByRange (multi-column, one pass) == chained " +
    "runningSumByRange, bit-for-bit") {
    val df = spark.range(10000).select(
      col("id"),
      ((col("id") * 48271) % 997).as("a"),
      ((col("id") * 16807) % 101).as("v1"),
      ((col("id") * 69621) % 53).as("v2"))
    val got = Scan.runningSumsByRange(df, col("a"), col("id"),
      Seq(col("v1") -> "o1", col("v2") -> "o2"), lo = 0L, hi = 997L, buckets = 16)
      .select("id", "o1", "o2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = Scan.runningSumByRange(
      Scan.runningSumByRange(df, col("a"), col("id"), col("v1"), "o1",
        lo = 0L, hi = 997L, buckets = 16),
      col("a"), col("id"), col("v2"), "o2", lo = 0L, hi = 997L, buckets = 16)
      .select("id", "o1", "o2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 10000 && got == want)
  }

  test("runningSumByRange == single global exclusive-sum window, with ties") {
    val df = spark.range(10000).select(
      col("id"),
      ((col("id") * 48271) % 997).as("a"),      // order key WITH duplicates
      ((col("id") * 16807) % 101).as("v"))      // integral values: exact sums
    val got = Scan.runningSumByRange(df, col("a"), col("id"), col("v"),
      "off", lo = 0L, hi = 997L, buckets = 16)
      .select("id", "off")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy("a", "id").rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("off", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "off")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 10000 && got == want)
  }

  test("lateEventsScalable == q37_late_events on real data (both SFs)") {
    for (d <- Seq(sf001, sf01)) {
      val got = Scan.lateEventsScalable(Tables.events(spark, d))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = SparkEntry.queries("q37_late_events")(spark, d)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(want.nonEmpty)
      assert(got == want, s"$d: got=$got want=$want")
    }
  }

  test("plan shape: global-order windows only ever see the bucket-reduced frame") {
    val plan = Scan.lateEventsScalable(Tables.events(spark, sf01))
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    val globals = windows.filter(_.partitionSpec.isEmpty)
    assert(globals.nonEmpty, "the carry prefix window should exist")
    globals.foreach { w =>
      assert(w.child.exists(_.isInstanceOf[Aggregate]),
        "an unpartitioned Window reads the raw event scan — the scan is not distributed")
    }
    // and the data-sized window IS partitioned
    assert(windows.exists(_.partitionSpec.nonEmpty))
  }
}

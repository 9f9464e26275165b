package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-scan (running aggregate over a GLOBAL order) — the
  * scale-safe form of q37's `Window.orderBy(...)` running watermark, which
  * is a single task sorting the world at 100 TB (the one remaining
  * global-window construct flagged weak by rounds 1–2).
  *
  * Classic two-pass scan: deterministically range-bucket the global order
  * key, run the running aggregate WITHIN each bucket in parallel, reduce
  * each bucket to one row, prefix-combine those P rows (driver-scale), and
  * broadcast the carry-in back. Total cost: one partitioned window + one
  * P-row window + one broadcast join — no global sort, no single-partition
  * pass over the data. Equality with the single-window form is locked
  * bit-for-bit by ScanSpec.
  */
object Scan {

  /** Running max of `valueCol` over the global order (orderCol asc,
    * tieCol asc), emitted as `outCol`. `orderCol` must be numeric with
    * known bounds [lo, hi) so bucket boundaries are pure arithmetic
    * (deterministic — no sampling, unlike repartitionByRange) and bucket
    * ids follow the global order. */
  def runningMaxByRange(
      df: DataFrame, orderCol: Column, tieCol: Column, valueCol: Column,
      outCol: String, lo: Long, hi: Long, buckets: Int = 32): DataFrame = {
    val span = math.max(1L, (hi - lo + buckets - 1) / buckets)
    val withBucket = df.withColumn("__graft_b",
      floor((orderCol - lit(lo)) / lit(span)).cast("long"))
    // pass 1: running max inside each bucket, all buckets in parallel
    val wIn = Window.partitionBy("__graft_b").orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withBucket.withColumn("__graft_local", max(valueCol).over(wIn))
    // pass 2: one row per bucket, prefix-max over the carry-ins; this
    // window IS single-partition, over at most `buckets` rows — the whole
    // point of the exchange being tiny
    val wPrev = Window.orderBy("__graft_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = withBucket
      .groupBy("__graft_b").agg(max(valueCol).as("__graft_bmax"))
      .withColumn("__graft_carry", max(col("__graft_bmax")).over(wPrev))
      .select("__graft_b", "__graft_carry")
    // pass 3: broadcast the P-row carry table back and combine
    local
      .join(broadcast(carry), Seq("__graft_b"))
      .withColumn(outCol,
        when(col("__graft_carry").isNull, col("__graft_local"))
          .otherwise(greatest(col("__graft_local"), col("__graft_carry"))))
      .drop("__graft_b", "__graft_local", "__graft_carry")
  }

  /** Exclusive running SUM of `valueCol` over the global order (orderCol
    * asc, tieCol asc) — the offset assignment of a sequence-packing /
    * concat-then-chunk pipeline: each row's output is the total of every
    * row strictly before it in the global order. Same two-pass scan shape
    * as [[runningMaxByRange]]: per-bucket exclusive sums in parallel, a
    * P-row prefix over the bucket totals, broadcast the carry back. Sums
    * must be exact (use integral valueCol) or order-insensitive. */
  def runningSumByRange(
      df: DataFrame, orderCol: Column, tieCol: Column, valueCol: Column,
      outCol: String, lo: Long, hi: Long, buckets: Int = 32): DataFrame = {
    val span = math.max(1L, (hi - lo + buckets - 1) / buckets)
    val withBucket = df.withColumn("__graft_b",
      floor((orderCol - lit(lo)) / lit(span)).cast("long"))
    val wIn = Window.partitionBy("__graft_b").orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withBucket.withColumn("__graft_local",
      coalesce(sum(valueCol).over(wIn), lit(0L)))
    val wPrev = Window.orderBy("__graft_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = withBucket
      .groupBy("__graft_b").agg(sum(valueCol).as("__graft_bsum"))
      .withColumn("__graft_carry",
        coalesce(sum(col("__graft_bsum")).over(wPrev), lit(0L)))
      .select("__graft_b", "__graft_carry")
    local
      .join(broadcast(carry), Seq("__graft_b"))
      .withColumn(outCol, col("__graft_local") + col("__graft_carry"))
      .drop("__graft_b", "__graft_local", "__graft_carry")
  }

  /** Exclusive running SUMs of SEVERAL value columns over one global
    * order in a SINGLE two-pass scan — the n-column generalization of
    * [[runningSumByRange]] (chaining it n times would re-window and
    * re-exchange the table per column; one pass shares the bucket window
    * and the P-row carry across all columns). Same determinism contract:
    * integral (or order-insensitive) value columns only. */
  def runningSumsByRange(
      df: DataFrame, orderCol: Column, tieCol: Column,
      valueCols: Seq[(Column, String)],
      lo: Long, hi: Long, buckets: Int = 32): DataFrame = {
    val span = math.max(1L, (hi - lo + buckets - 1) / buckets)
    val withBucket = df.withColumn("__graft_b",
      floor((orderCol - lit(lo)) / lit(span)).cast("long"))
    val wIn = Window.partitionBy("__graft_b").orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = valueCols.zipWithIndex.foldLeft(withBucket) {
      case (acc, ((vc, _), i)) => acc.withColumn(s"__graft_l$i",
        coalesce(sum(vc).over(wIn), lit(0L)))
    }
    val wPrev = Window.orderBy("__graft_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = withBucket
      .groupBy("__graft_b")
      .agg(valueCols.zipWithIndex.map { case ((vc, _), i) =>
        sum(vc).as(s"__graft_s$i") }.head,
        valueCols.zipWithIndex.tail.map { case ((vc, _), i) =>
          sum(vc).as(s"__graft_s$i") }: _*)
    val carryCum = valueCols.indices.foldLeft(carry) { (acc, i) =>
      acc.withColumn(s"__graft_c$i",
        coalesce(sum(col(s"__graft_s$i")).over(wPrev), lit(0L)))
    }.select(col("__graft_b") +: valueCols.indices.map(i => col(s"__graft_c$i")): _*)
    val joined = local.join(broadcast(carryCum), Seq("__graft_b"))
    valueCols.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, col(s"__graft_l$i") + col(s"__graft_c$i"))
    }.drop("__graft_b")
      .drop(valueCols.indices.flatMap(i => Seq(s"__graft_l$i", s"__graft_c$i")): _*)
  }

  /** q37's late-event classification in the scale-safe form: same arrival
    * permutation, same 10-minute lateness rule, but the running watermark
    * comes from the distributed scan instead of one global window. */
  def lateEventsScalable(events: DataFrame, buckets: Int = 32): DataFrame = {
    val arrival = (col("event_id") * 7919) % 104729
    runningMaxByRange(
      events.withColumn("__graft_a", arrival),
      col("__graft_a"), col("event_id"), col("ts"),
      "wm", lo = 0L, hi = 104729L, buckets = buckets)
      .withColumn("is_late", col("ts") < col("wm") - expr("INTERVAL 10 MINUTES"))
      .groupBy("event_type")
      .agg(
        sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late"),
        count(lit(1)).as("n_total"))
      .orderBy("event_type")
  }
}

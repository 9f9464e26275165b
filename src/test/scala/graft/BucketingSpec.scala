package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the SCALE.md §1 claim: bucketed tables make the orders⋈lineitem
  * join shuffle-free (both sides pre-partitioned by the join key at write
  * time — at 100 TB this deletes the two biggest exchanges in the
  * workload). Uses the session catalog's warehouse; only DDL changes, the
  * join code is identical to q-series joins.
  */
class BucketingSpec extends AnyFunSuite {
  import SharedSpark.{sf001, spark}

  test("bucketed orders ⋈ lineitem joins without any shuffle exchange") {
    // (warehouse dir is a static conf — SharedSpark points it at a temp dir)
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")

    Tables.orders(spark, sf001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_orders_b")
    Tables.lineitem(spark, sf001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_b")

    // Disable auto-broadcast so the join would OTHERWISE be a shuffled SMJ.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the ONLY exchange allowed is the final single-key aggregation —
      // the join itself must read bucketed data with no repartitioning
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"join still shuffles:\n${plan.take(1500)}")
      // cross-check correctness vs the plain-parquet join
      val expected = Tables.orders(spark, sf001)
        .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the mechanism SCALE.md §3 relies on
  * for big-big joins at 100 TB: when a fact table shuffle-joins a
  * selectively-filtered dimension, Spark can build a bloom filter over the
  * dim's join keys and inject a `might_contain` predicate into the fact
  * scan, so most fact rows die before the exchange instead of after it.
  * At sf0.01/0.1 the default size thresholds (10 MB creation side, 10 GB
  * application side) never trigger, so this spec lowers them to prove the
  * wiring and the value-identity — the confs are the same knobs a 100 TB
  * deployment tunes.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bloom filter injected into the fact side of a selective dim join; rows unchanged") {
    val join = () => Tables.lineitem(spark, sf01)
      .join(
        Tables.orders(spark, sf01).where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_quantity"), col("o_orderpriority"))
    val baseline = join().count()
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // sf-scale tables are below the production thresholds; zeroing the
      // application-side floor is what makes the optimization observable
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle-join shape (broadcast joins don't need blooms)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = join()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        "no bloom filter was injected into the application side")
      assert(df.count() == baseline,
        "bloom pruning must be value-transparent (false-positive-only filter)")
    }
  }
}

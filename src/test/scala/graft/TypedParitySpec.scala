package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Typed

/** The typed Dataset[T] surface computes bit-identical results to the
  * declared DataFrame queries (round-2 VERDICT stretch task: the last
  * unexercised API row of SURVEY.md §1.1 — case-class ergonomics).
  * Doubles are compared EXACTLY: the typed aggregators reproduce the §2.4
  * decimal bridge, so any drift is a real determinism bug.
  */
class TypedParitySpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  test("typed filter == q02_filter") {
    val typed = Typed.filterTyped(spark, sf01).collect()
      .map(r => (r.l_orderkey, r.l_linenumber, r.l_shipdate, r.l_quantity, r.l_discount))
    val df = SparkEntry.queries("q02_filter")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3), r.getDouble(4)))
    assert(typed.nonEmpty)
    assert(typed.toSeq == df.toSeq)
  }

  test("typed exact-decimal Aggregator == q04_agg_pricing (incl. raw IEEE averages)") {
    val typed = Typed.pricingTyped(spark, sf01).collect()
      .map(r => (r.l_returnflag, r.l_linestatus, r.sum_qty, r.sum_base_price,
        r.sum_disc_price, r.avg_qty, r.n_items))
    val df = SparkEntry.queries("q04_agg_pricing")(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(typed.nonEmpty)
    assert(typed.toSeq == df.toSeq)
  }

  test("typed joinWith + Aggregator == q09_join_inner") {
    val typed = Typed.joinTyped(spark, sf01).collect()
      .map(r => (r.c_mktsegment, r.n_orders, r.sum_price))
    val df = SparkEntry.queries("q09_join_inner")(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(typed.nonEmpty)
    assert(typed.toSeq == df.toSeq)
  }
}

package graft.ops

import java.math.{BigDecimal => JBig, RoundingMode}
import java.time.LocalDateTime

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed records for the star-schema tables (schemas match the parquet
  * exactly, so `.as[T]` is a zero-copy schema assertion). */
case class Lineitem(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
    l_returnflag: String, l_linestatus: String, l_shipdate: LocalDateTime)

case class Order(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)

case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)

case class FilterRow(
    l_orderkey: Long, l_linenumber: Int, l_shipdate: LocalDateTime,
    l_quantity: Double, l_discount: Double)

case class PricingRow(
    l_returnflag: String, l_linestatus: String, sum_qty: Double,
    sum_base_price: Double, sum_disc_price: Double, avg_qty: Double, n_items: Long)

case class SegmentRow(c_mktsegment: String, n_orders: Long, sum_price: Double)

/** Aggregation buffer for Typed.PricingAgg (top-level: generated code must
  * be able to reference the class and its accessors). */
case class PricingBuf(sumQty: java.math.BigDecimal, sumBase: java.math.BigDecimal,
    sumDisc: java.math.BigDecimal, n: Long)

/** Typed `Dataset[T]` variants of q02/q04/q09 — the case-class ergonomics
  * surface (SURVEY.md §1.1: Flink programs are written against POJOs/case
  * classes; a user porting such a program wants `Dataset[Lineitem]`, lambda
  * filters, `joinWith`, and `Aggregator`s, not just column expressions).
  *
  * Determinism: the aggregators reproduce the §2.4 decimal bridge exactly —
  * each double is scaled to DECIMAL(18,4) with HALF_UP via the same
  * shortest-repr route Spark's double→decimal cast takes
  * (`BigDecimal.valueOf`), summed exactly (order-independent, so
  * shuffle-safe), and only then cast to double; averages divide the
  * decimal-sum-as-double by the count, raw. TypedParitySpec asserts
  * bit-identical results against the DataFrame forms.
  *
  * Scale: groupByKey + Aggregator compiles to the same partial/final
  * HashAggregate shuffle shape as the untyped groupBy (typed lambdas cost
  * deserialization, documented in SCALE.md §7 — these exist for API parity,
  * the declared queries stay untyped).
  */
object Typed {

  def lineitems(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._
    graft.Tables.lineitem(s, d).as[Lineitem]
  }
  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    graft.Tables.orders(s, d).as[Order]
  }
  def customers(s: SparkSession, d: String): Dataset[Customer] = {
    import s.implicits._
    graft.Tables.customer(s, d).as[Customer]
  }

  /** The exact double→DECIMAL(18,4) bridge (tie-free on 2-decimal data). */
  private def dec4(d: Double): JBig =
    JBig.valueOf(d).setScale(4, RoundingMode.HALF_UP)

  /** q02_filter, typed: lambda predicates over Lineitem. */
  def filterTyped(s: SparkSession, d: String): Dataset[FilterRow] = {
    import s.implicits._
    val lo = LocalDateTime.parse("1996-01-01T00:00:00")
    val hi = LocalDateTime.parse("1997-01-01T00:00:00")
    lineitems(s, d)
      .filter(l =>
        !l.l_shipdate.isBefore(lo) && l.l_shipdate.isBefore(hi) &&
          l.l_discount >= 0.02 && l.l_discount <= 0.09 && l.l_quantity < 24)
      .map(l => FilterRow(l.l_orderkey, l.l_linenumber, l.l_shipdate, l.l_quantity, l.l_discount))
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_discount")
      .limit(200)
  }

  object PricingAgg
      extends Aggregator[Lineitem, PricingBuf, (Double, Double, Double, Double, Long)] {
    def zero: PricingBuf = PricingBuf(JBig.ZERO, JBig.ZERO, JBig.ZERO, 0L)
    def reduce(b: PricingBuf, l: Lineitem): PricingBuf = PricingBuf(
      b.sumQty.add(dec4(l.l_quantity)),
      b.sumBase.add(dec4(l.l_extendedprice)),
      b.sumDisc.add(dec4(l.l_extendedprice * (1.0 - l.l_discount))),
      b.n + 1)
    def merge(a: PricingBuf, b: PricingBuf): PricingBuf = PricingBuf(
      a.sumQty.add(b.sumQty), a.sumBase.add(b.sumBase),
      a.sumDisc.add(b.sumDisc), a.n + b.n)
    def finish(b: PricingBuf): (Double, Double, Double, Double, Long) = (
      b.sumQty.doubleValue, b.sumBase.doubleValue, b.sumDisc.doubleValue,
      b.sumQty.doubleValue / b.n, b.n)
    def bufferEncoder: Encoder[PricingBuf] = Encoders.product[PricingBuf]
    def outputEncoder: Encoder[(Double, Double, Double, Double, Long)] =
      Encoders.product[(Double, Double, Double, Double, Long)]
  }

  /** q04_agg_pricing, typed: groupByKey + a custom exact-decimal Aggregator. */
  def pricingTyped(s: SparkSession, d: String): Dataset[PricingRow] = {
    import s.implicits._
    lineitems(s, d)
      .groupByKey(l => (l.l_returnflag, l.l_linestatus))
      .agg(PricingAgg.toColumn)
      .map { case ((rf, ls), (q, base, disc, avg, n)) =>
        PricingRow(rf, ls, q, base, disc, avg, n)
      }
      .orderBy("l_returnflag", "l_linestatus")
  }

  object SegmentAgg
      extends Aggregator[(Order, Customer), (JBig, Long), (Double, Long)] {
    def zero: (JBig, Long) = (JBig.ZERO, 0L)
    def reduce(b: (JBig, Long), oc: (Order, Customer)): (JBig, Long) =
      (b._1.add(dec4(oc._1.o_totalprice)), b._2 + 1)
    def merge(a: (JBig, Long), b: (JBig, Long)): (JBig, Long) =
      (a._1.add(b._1), a._2 + b._2)
    def finish(b: (JBig, Long)): (Double, Long) = (b._1.doubleValue, b._2)
    def bufferEncoder: Encoder[(JBig, Long)] = Encoders.product[(JBig, Long)]
    def outputEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
  }

  /** q09_join_inner, typed: joinWith keeps both sides as case classes. */
  def joinTyped(s: SparkSession, d: String): Dataset[SegmentRow] = {
    import s.implicits._
    orders(s, d)
      .joinWith(customers(s, d), $"o_custkey" === $"c_custkey", "inner")
      .groupByKey(_._2.c_mktsegment)
      .agg(SegmentAgg.toColumn)
      .map { case (seg, (sum, n)) => SegmentRow(seg, n, sum) }
      .orderBy("c_mktsegment")
  }
}

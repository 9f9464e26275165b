package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-extension surface demos (SURVEY.md §5.3): a typed Aggregator
  * (UDAF), a scalar UDF, and explode-as-UDTF are exercised in
  * UdfSurfaceSpec. These are the extension points a user of the engine
  * reaches for when functions._ runs out — kept OUT of the declared
  * queries, which stay 100% codegen-friendly builtins.
  */

/** Geometric mean as a typed Aggregator — exact log-domain accumulation,
  * mergeable (shuffle-safe at any scale). */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
  def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
  def finish(r: (Double, Long)): Double = if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Udfs {
  /** Column form of the geometric-mean UDAF. */
  def geomean(c: Column): Column = udaf(GeometricMean).apply(c)

  /** Register the demo scalar UDF: discount band labeling (same semantics
    * as q03's built-in CASE WHEN — the spec cross-checks them). */
  def registerDiscBand(spark: SparkSession): Unit =
    spark.udf.register("graft_disc_band", (d: Double) =>
      if (d < 0.03) "LOW" else if (d < 0.07) "MID" else "HIGH")
}

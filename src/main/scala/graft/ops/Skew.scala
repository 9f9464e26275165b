package graft.ops

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregations (SCALE.md §3): when one group
  * key dominates (a viral event_type, the `en` language bucket), its
  * single reducer becomes the straggler. Salting splits each key into
  * `salts` sub-keys for the partial aggregation, then combines — two
  * balanced shuffles instead of one shuffle with a hot partition.
  *
  * Works for any aggregate that is associative+commutative across partial
  * results: counts, integer sums, and this library's exact DECIMAL sums
  * (one more payoff of the determinism bridge — salted re-aggregation
  * cannot change a decimal sum, so the result is bit-identical to the
  * unsalted plan; SkewSpec asserts it).
  */
object Skew {

  /** groupBy(keyCol) → (n_rows, sum_value) with salt-based two-phase
    * execution. The salt is a deterministic hash of the full row —
    * no rand()/monotonic ids, so re-runs and retries agree.
    */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16
  ): DataFrame = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(salts))
    df.withColumn("_salt", salt)
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol).cast(Det.D)).as("_s"))
      .groupBy(keyCol)
      .agg(
        sum(col("_n")).as("n_rows"),
        round(sum(col("_s")), 4).cast("double").as("sum_value")
      )
  }

  /** The unsalted reference plan (what AQE would run un-mitigated). */
  def plainCountSum(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("n_rows"), Det.dsum(col(valueCol)).as("sum_value"))
}

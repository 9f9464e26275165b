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
    * execution. The salt is a deterministic hash of `saltCols` (default:
    * key + value, both known hashable — hashing every column would throw
    * at runtime on unhashable types like MapType) — no rand()/monotonic
    * ids, so re-runs and retries agree.
    *
    * Limitation (inherent to deterministic salting): rows that are
    * identical on `saltCols` hash to the SAME salt bucket, so a hot key
    * whose rows are all identical gets zero spread — pass a
    * distinguishing column (an id, a timestamp) in `saltCols` for such
    * data, or fall back to AQE skew handling.
    */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16,
      saltCols: Seq[String] = Nil
  ): DataFrame = {
    val saltName = "__graft_salt"
    require(!df.columns.contains(saltName), s"input already has a $saltName column")
    val sc = if (saltCols.nonEmpty) saltCols else Seq(keyCol, valueCol)
    val salt = pmod(hash(sc.map(col): _*), lit(salts))
    df.withColumn(saltName, salt)
      .groupBy(col(keyCol), col(saltName))
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

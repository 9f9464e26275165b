package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Udfs

/** The UDF/UDAF/UDTF extension surface, each cross-checked against a
  * built-in equivalent (SURVEY.md §5.3). */
class UdfSurfaceSpec extends AnyFunSuite {
  import SharedSpark.{sf001, spark}

  test("Aggregator UDAF: geometric mean matches exp(avg(ln)) per group") {
    val li = Tables.lineitem(spark, sf001)
    val viaUdaf = li.groupBy("l_returnflag")
      .agg(Udfs.geomean(col("l_quantity")).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaBuiltin = li.groupBy("l_returnflag")
      .agg(exp(avg(log(col("l_quantity")))).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaUdaf.keySet == viaBuiltin.keySet)
    viaUdaf.foreach { case (k, v) =>
      assert(math.abs(v - viaBuiltin(k)) < 1e-9, s"group $k: $v vs ${viaBuiltin(k)}")
    }
  }

  test("scalar UDF matches the built-in CASE WHEN it mirrors") {
    Udfs.registerDiscBand(spark)
    val li = Tables.lineitem(spark, sf001)
    val mismatches = li
      .withColumn("via_udf", call_udf("graft_disc_band", col("l_discount")))
      .withColumn(
        "via_case",
        when(col("l_discount") < 0.03, "LOW").when(col("l_discount") < 0.07, "MID").otherwise("HIGH")
      )
      .where(col("via_udf") =!= col("via_case"))
      .count()
    assert(mismatches == 0)
  }

  test("explode (the UDTF slot) agrees with a size-based count") {
    val docs = Tables.documents(spark, sf001)
    val viaExplode = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .count()
    val viaSize = docs
      .agg(sum(size(split(col("text"), " "))))
      .collect()(0).getLong(0)
    assert(viaExplode == viaSize)
  }
}

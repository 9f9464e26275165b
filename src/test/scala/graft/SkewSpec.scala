package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  import SharedSpark.{sf01, spark}

  test("salted two-phase aggregation is bit-identical to the plain plan") {
    val ev = Tables.events(spark, sf01)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = toMap(Skew.saltedCountSum(ev, "event_type", "value"))
    val plain = toMap(Skew.plainCountSum(ev, "event_type", "value"))
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      val (pn, ps) = plain(k)
      assert(n == pn)
      assert(java.lang.Double.doubleToLongBits(s) == java.lang.Double.doubleToLongBits(ps),
        s"$k: salted $s != plain $ps")
    }
  }

  test("salted plan has two aggregation exchanges (the skew split)") {
    val df = Skew.saltedCountSum(Tables.events(spark, sf01), "event_type", "value")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2, s"expected salt + final exchanges:\n${plan.take(800)}")
  }

  test("AQE skew-join handling engages on a skewed shuffle join (round-1 task 8)") {
    import org.apache.spark.sql.functions._
    // Thresholds scaled down so the skew machinery is observable on a
    // local fixture (production uses the 256MB/64MB defaults — SCALE.md §3:
    // the mechanism, not the numbers, is what must be proven to engage).
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // one pathological key: ~83% of the left side lands in one partition
      val left = spark.range(300000).select(
        when(col("id") < 250000, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 100, "x").as("payload"))
      val right = spark.range(100).select(col("id").as("k"), lit("dim").as("side"))
      val joined = left.join(right, "k")
      // execute THIS plan (count() would plan a separate pruned query and
      // leave joined's AdaptiveSparkPlan unfinalized)
      var n = 0L
      joined.toLocalIterator().forEachRemaining(_ => n += 1)
      assert(n == 250000L) // only k=0 matches the dim side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan not finalized:\n${plan.take(400)}")
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not engage:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

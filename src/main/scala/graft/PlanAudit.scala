package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump per-query physical-plan stats (exchanges, broadcasts,
  * codegen stages, scans) so shuffle regressions are visible at a glance.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-26s ${"exch"}%5s ${"bcast"}%5s ${"smj"}%4s ${"bhj"}%4s ${"nlj"}%4s ${"scans"}%5s")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).size
        println(f"$name%-26s ${n("Exchange")}%5d ${n("BroadcastExchange")}%5d " +
          f"${n("SortMergeJoin")}%4d ${n("BroadcastHashJoin")}%4d ${n("NestedLoop")}%4d ${n("FileScan|Scan parquet")}%5d")
      } catch { case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}

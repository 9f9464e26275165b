package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke check: SparkEntry.entry at sf0.001
  * must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "FAIL"))
    val media = multimodal.Multimodal.synthesize(spark, "/root/testdata/sf0.001")
    val feats = multimodal.Multimodal.extractFeatures(media).count()
    val stats = multimodal.Multimodal.metaStats(media).count()
    println(s"[smoke] multimodal features=$feats metaStats=$stats " +
      (if (feats > 0 && stats > 0) "OK" else "FAIL"))
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val csvDir = java.nio.file.Files.createTempDirectory("graft_smoke").toString + "/c.csv"
    sources.Sources.writeCsv(cust, csvDir)
    val back = sources.Sources.readCsv(spark, csvDir, cust.schema).count()
    println(s"[smoke] csv round-trip rows=$back " +
      (if (back == cust.count()) "OK" else "FAIL"))
    val pipeOut = java.nio.file.Files.createTempDirectory("graft_smoke_pipe").toString + "/docs"
    val rep = pipeline.TrainingDataPipeline.run(spark, "/root/testdata/sf0.001", pipeOut)
    println(s"[smoke] pipeline ${rep.input}->${rep.afterQuality}->${rep.afterLang}->" +
      s"${rep.afterExactDedup}->${rep.afterNearDedup} " +
      (if (rep.afterNearDedup > 0) "OK" else "FAIL"))
    spark.stop()
  }
}

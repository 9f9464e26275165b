package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-gen` DataSource V2 (sources/GraftGenSource): generator
  * contract, parallel range partitioning, column pruning, and
  * filter-driven partition pruning — the custom-source rung of the
  * extension ladder, complementing q84's oracle gate (which replays the
  * generator arithmetic in DuckDB).
  */
class GenSourceSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def read(rows: Long, parts: Int) =
    spark.read.format("graft-gen")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.size == 1, s"expected one BatchScanExec: ${df.queryExecution.executedPlan}")
    scans.head
  }

  test("generator contract: every row matches GraftGen.expected") {
    val got = read(997, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = (0L until 997L).map(sources.GraftGen.expected).toSet
    assert(got == want)
  }

  test("rows split into the requested number of range partitions") {
    assert(scanOf(read(1000, 8)).inputPartitions.size == 8)
    assert(scanOf(read(3, 8)).inputPartitions.size == 3) // never more than rows
  }

  test("id-range filters prune whole partitions AND stay residual") {
    val df = read(1000, 8).where(col("id") >= 500L && col("id") < 625L)
    val scan = scanOf(df)
    assert(scan.inputPartitions.size == 1,
      s"[500, 625) spans exactly one 125-row partition: ${scan.inputPartitions}")
    // residual semantics: a predicate the source does NOT understand still
    // returns exact results (pushdown is a pruning hint, not correctness)
    val odd = read(1000, 8).where(col("id") >= 990L && col("id") % 2 === 1)
    assert(odd.collect().map(_.getLong(0)).sorted.toSeq ==
      (991L until 1000L by 2).toSeq)
  }

  test("column pruning reaches the reader (readSchema is the projection)") {
    val scan = scanOf(read(100, 2).select("lang", "n_toks"))
    assert(scan.scan.readSchema().fieldNames.toSet == Set("lang", "n_toks"))
  }

  test("graft-stats sink: commit protocol aggregates exactly what tasks wrote") {
    sources.StatsSinkRegistry.reports.remove("spec")
    val df = read(10000, 6).where(col("id") % 3 === 0)
    df.write.format("graft-stats").option("key", "spec").mode("append").save()
    val report = sources.StatsSinkRegistry.reports.get("spec")
    assert(report.isDefined, "commit() never published a report")
    assert(report.get.rows == df.count(), s"committed row count is wrong: $report")
    assert(report.get.tasks > 1, s"write should run in parallel tasks: $report")
    assert(report.get.bytesApprox > 0)
  }
}

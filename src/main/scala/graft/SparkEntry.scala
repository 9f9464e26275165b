package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory (SURVEY.md §2.2) is assembled from the ops
  * modules; every entry carries both a Spark implementation and a DuckDB
  * oracle, hash-compared by the driver at sf0.01.
  */
object SparkEntry {

  private val all: Vector[(String, QDef)] =
    ops.Relational.defs ++ ops.StreamingBatch.defs ++ ops.LlmExt.defs ++
      ops.LlmExt2.defs ++ ops.Relational2.defs ++ ops.ScaleQueries.defs ++
      ops.Curation.defs ++ ops.Audit.defs ++ ops.Curation2.defs ++
      ops.Analytics.defs ++ ops.Profiling.defs ++ ops.Nested.defs ++
      ops.Mining.defs ++ ops.Graph.defs ++ ops.Ordered.defs ++
      ops.Series.defs ++ ops.Round8.defs ++ ops.Round9.defs ++ ops.Round9b.defs ++
      ops.Round9c.defs ++ ops.Round9d.defs ++ ops.Round9e.defs ++
      ops.Round10.defs ++ ops.Round10b.defs ++ ops.Round10c.defs ++
      ops.Round10d.defs ++ ops.Round10e.defs ++ ops.Round10f.defs ++
      ops.Round10g.defs ++ ops.Round10h.defs ++ ops.Round10i.defs ++
      ops.Round10j.defs ++ ops.Round10k.defs ++ ops.Round10l.defs ++
      ops.Round10m.defs ++ ops.Round10n.defs ++ ops.Round10o.defs ++
      ops.Round10p.defs ++ ops.Round10q.defs ++ ops.Round10r.defs ++
      ops.Round10s.defs ++ ops.Round10t.defs ++ ops.Round11.defs ++
      ops.Round11b.defs ++ ops.Round11c.defs ++ ops.Round12.defs ++
      ops.Round12b.defs ++ ops.Round12c.defs ++ ops.Round13.defs ++
      ops.Round13b.defs ++ ops.Round14.defs ++ ops.Round15.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q35_broadcast_rules IS the reference's reason to exist (the Flink
    * broadcast-state pattern, SURVEY.md §2.1 R7–R9). */
  def entry(spark: SparkSession): DataFrame =
    queries("q35_broadcast_rules")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.run }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted (null oracle) for non-portable ops
    * like q54's approximate sketches → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, q) if q.oracle != null => name -> q.oracle }.toMap
}

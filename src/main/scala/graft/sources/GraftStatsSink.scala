package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  Write, WriteBuilder, WriterCommitMessage
}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK (`graft-stats`) — the write-side counterpart
  * of [[GraftGenSource]], demonstrating the full batch commit protocol
  * that the built-in file sinks hide: per-task [[DataWriter]]s count what
  * they actually wrote, ship a [[WriterCommitMessage]] on task commit,
  * and ONLY the driver-side [[BatchWrite.commit]] publishes the
  * aggregated report — so a retried/aborted task never double-counts
  * (task messages from losing attempts are simply dropped by Spark
  * before commit). This is the audit-sink shape a curation pipeline
  * ships: every write job reports exactly what landed.
  *
  * The report is published to [[StatsSinkRegistry]] under the mandatory
  * `key` option. On a real cluster the same messages flow from executors
  * to the driver through the commit RPC — the registry write happens
  * exclusively in driver-side commit(), so the pattern is
  * cluster-correct even though this repo tests it in one JVM.
  */
class GraftStatsSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-stats"
  // write-only: accept whatever schema the query writes
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new StatsTable(schema)
}

/** One write job's aggregated outcome. */
case class WriteReport(rows: Long, tasks: Int, bytesApprox: Long)

/** Driver-side registry of committed write reports, keyed by the write's
  * `key` option. Cleared by tests; a production audit sink would emit to
  * a catalog/metrics system here instead. */
object StatsSinkRegistry {
  val reports: TrieMap[String, WriteReport] = TrieMap.empty

  /** Streaming reports, keyed (key, epochId). A replayed epoch (restart
    * re-runs the last uncommitted batch) overwrites its slot with the
    * identical deterministic report — per-epoch idempotence is exactly
    * the DSv2 StreamingWrite exactly-once contract. */
  val epochReports: TrieMap[(String, Long), WriteReport] = TrieMap.empty
}

private[sources] class StatsTable(writeSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft_stats"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val key = info.options.get("key")
    require(key != null, "graft-stats sink requires a 'key' option")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new StatsBatchWrite(key)
        override def toStreaming: StreamingWrite = new StatsStreamingWrite(key)
      }
    }
  }
}

private[sources] case class StatsMessage(rows: Long, bytesApprox: Long)
    extends WriterCommitMessage

private[sources] class StatsBatchWrite(key: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StatsWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: StatsMessage => m }
    StatsSinkRegistry.reports.put(
      key, WriteReport(ms.map(_.rows).sum, ms.length, ms.map(_.bytesApprox).sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming commit protocol: same per-task counting writers, but the
  * driver-side commit is PER EPOCH — the engine only advances the offset
  * log after this returns, so each micro-batch's report is published
  * atomically with the batch itself. */
private[sources] class StatsStreamingWrite(key: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StatsStreamingWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: StatsMessage => m }
    StatsSinkRegistry.epochReports.put(
      (key, epochId),
      WriteReport(ms.map(_.rows).sum, ms.length, ms.map(_.bytesApprox).sum))
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class StatsStreamingWriterFactory extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new StatsWriterFactory().createWriter(partitionId, taskId)
}

private[sources] class StatsWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        // approximate payload: UnsafeRow knows its size; other rows count fields
        bytes += (record match {
          case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.getSizeInBytes.toLong
          case r => r.numFields.toLong * 8
        })
      }
      override def commit(): WriterCommitMessage = StatsMessage(rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

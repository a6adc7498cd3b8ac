package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-audit` — the write-side twin of [[SynthSource]]: a
  * DataSource V2 BATCH sink that materializes NOTHING, but accounts
  * for everything. Each executor-side writer counts rows and
  * serialized bytes for its partition; the counts travel back
  * through the connector's commit protocol (WriterCommitMessage →
  * BatchWrite.commit on the driver) and land in a process-local
  * stats registry keyed by the `name` option.
  *
  * {{{
  * df.write.format("graft-audit").option("name", "run1").save()
  * val st = AuditSink.stats("run1")   // rows, bytes, partitions
  * }}}
  *
  * Why it exists: sink-side benchmarking and pipeline dry-runs. At
  * 100 TB the question "how much does this stage PRODUCE" is usually
  * answered by writing the output somewhere expensive; a blackhole
  * with exact accounting answers it at full speed with zero storage,
  * and exercises the identical write path (task-level commit
  * messages, driver-side commit, abort semantics) a real connector
  * uses. The commit protocol also demonstrates correct
  * speculative-retry behavior: stats come ONLY from committed task
  * messages, so duplicate/aborted attempts never double-count.
  */
class AuditSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-audit"

  /** Accepts any schema — the sink is schema-agnostic. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema,
      Option(properties.get("name")).getOrElse("default"))
}

object AuditSink {
  /** One audit record per (named) sink; every field — rows, bytes,
    * partitions (task commits), commits (job commits) — accumulates
    * across repeated writes to the same name, so the totals stay
    * mutually consistent. */
  final case class Stats(rows: Long, bytes: Long, partitions: Int,
      commits: Long)

  private val registry = new ConcurrentHashMap[String, Stats]()

  def stats(name: String): Option[Stats] = Option(registry.get(name))

  private[sources] def record(name: String, rows: Long, bytes: Long,
      partitions: Int): Unit =
    registry.compute(name, (_, prev) => prev match {
      case null => Stats(rows, bytes, partitions, 1L)
      case p => Stats(p.rows + rows, p.bytes + bytes,
        p.partitions + partitions, p.commits + 1L)
    })

  def reset(name: String): Unit = registry.remove(name)
}

final class AuditTable(schema0: StructType, auditName: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-audit($auditName)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(auditName)
      }
    }
}

/** Per-task result: the ONLY channel stats travel through — a task
  * attempt that aborts contributes nothing. */
final case class AuditCommit(rows: Long, bytes: Long)
  extends WriterCommitMessage

final class AuditBatchWrite(auditName: String) extends BatchWrite {
  @volatile private var parts = 0

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    parts = info.numPartitions()
    new AuditWriterFactory
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var bytes = 0L
    messages.foreach { case AuditCommit(r, b) => rows += r; bytes += b }
    AuditSink.record(auditName, rows, bytes, parts)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class AuditWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var rows = 0L
    private var bytes = 0L
    override def write(record: InternalRow): Unit = {
      rows += 1
      // Serialized UnsafeRow size — the honest "what would hit the
      // wire/disk" measure for a row already in Tungsten format.
      record match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          bytes += u.getSizeInBytes
        case _ => ()
      }
    }
    override def commit(): WriterCommitMessage = AuditCommit(rows, bytes)
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}

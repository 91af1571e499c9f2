package graft.sources

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path — the sink extension point, shown on
  * the protocol that matters: Spark's two-phase commit. Every write task
  * emits a [[WriterCommitMessage]] (here: its partition's row count and
  * byte-ish weight); the driver's [[BatchWrite.commit]] sees EITHER all
  * messages or [[BatchWrite.abort]] — the all-or-nothing contract real
  * sinks (Delta commits, JDBC transactions, manifest swaps) build on. A
  * failed task never contributes: its message is dropped and the job
  * aborts, which the spec exercises with a mid-write exception.
  *
  * The committed audit (total rows, per-partition counts) lands in a
  * process-wide registry keyed by the `run` option — this sink audits
  * and discards rows (a counting /dev/null), standing in for any
  * destination whose commit is a metadata operation. */
class AuditSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // sink: accepts whatever schema the writer brings
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AuditTable(Option(properties.get("run")).getOrElse("default"))
}

object AuditSink {
  /** Committed audits by run id: (total rows, per-task row counts). */
  val committed = new ConcurrentHashMap[String, (Long, Seq[Long])]()
  val aborted = new ConcurrentHashMap[String, Boolean]()
}

private[sources] class AuditTable(run: String) extends Table with SupportsWrite {
  override def name: String = s"graft_audit_sink($run)"
  override def schema: StructType = new StructType()
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA) // sink takes whatever the writer brings
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(run)
      }
    }
}

private[sources] case class CountMsg(rows: Long) extends WriterCommitMessage

private[sources] class AuditBatchWrite(run: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val counts = messages.map(_.asInstanceOf[CountMsg].rows).toSeq
    AuditSink.committed.put(run, (counts.sum, counts))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    AuditSink.aborted.put(run, true)
}

private[sources] class AuditWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = CountMsg(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

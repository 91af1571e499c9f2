package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 — the engine's source EXTENSION POINT, shown
  * end-to-end on a deterministic sequence table (id, doc="doc-"+id):
  * `TableProvider` → `ScanBuilder` with REAL pushdown → range-split
  * `InputPartition`s → per-partition readers.
  *
  * Pushdown is where a custom source earns its keep at 100 TB:
  * - `SupportsPushDownFilters`: id range predicates narrow the scan's
  *   [lo, hi] BEFORE partitions are planned — a selective filter reads
  *   (and even plans) only the matching slice, the DSv2 analogue of
  *   parquet row-group pruning. Accepted filters are consumed (no
  *   residual re-evaluation); everything else stays with Spark.
  * - `SupportsPushDownRequiredColumns`: the reader materializes only
  *   requested columns — column pruning reaches the source, like a
  *   columnar format's ReadSchema.
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("n", rows).option("slices", parts).load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SeqTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8))
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("doc", StringType, nullable = false)))
}

private[sources] class SeqTable(n: Long, slices: Int)
    extends Table with SupportsRead {
  override def name: String = s"graft_seq(n=$n)"
  override def schema: StructType = SeqSource.schema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices)
}

private[sources] class SeqScanBuilder(n: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n - 1
  private var required: StructType = SeqSource.schema
  private var accepted: Array[Filter] = Array.empty

  private def long(v: Any): Option[Long] = v match {
    case x: Number => Some(x.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case GreaterThanOrEqual("id", v) => long(v).isDefined
      case GreaterThan("id", v) => long(v).isDefined
      case LessThanOrEqual("id", v) => long(v).isDefined
      case LessThan("id", v) => long(v).isDefined
      case EqualTo("id", v) => long(v).isDefined
      case _ => false
    }
    ok.foreach {
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, long(v).get)
      // saturate at the Long extremes: id > MaxValue must yield an empty
      // range, not wrap to MinValue and return every row (the filter is
      // consumed, so Spark never re-checks it)
      case GreaterThan(_, v) =>
        val x = long(v).get
        lo = if (x == Long.MaxValue) Long.MaxValue else math.max(lo, x + 1)
      case LessThanOrEqual(_, v) => hi = math.min(hi, long(v).get)
      case LessThan(_, v) =>
        val x = long(v).get
        hi = if (x == Long.MinValue) Long.MinValue else math.min(hi, x - 1)
      case EqualTo(_, v) => lo = math.max(lo, long(v).get); hi = math.min(hi, long(v).get)
      case _ =>
    }
    accepted = ok
    residual // accepted filters are fully applied here — no re-evaluation
  }
  override def pushedFilters: Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeqScan(lo, hi, slices, required)
}

private[sources] case class SeqRange(from: Long, until: Long) extends InputPartition

private[sources] class SeqScan(lo: Long, hi: Long, slices: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description: String =
    s"graft-seq[$lo..$hi] cols=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi < lo) return Array.empty
    val total = hi - lo + 1
    val k = math.min(math.max(1L, slices.toLong), total).toInt
    // contiguous ranges, remainder spread over the first partitions
    val base = total / k; val rem = total % k
    var start = lo
    (0 until k).map { i =>
      val len = base + (if (i < rem) 1 else 0)
      val p = SeqRange(start, start + len); start += len; p
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

private[sources] class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = r.from - 1
      override def next(): Boolean = { cur += 1; cur < r.until }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map {
          case "id" => cur
          case "doc" => UTF8String.fromString(s"doc-$cur")
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

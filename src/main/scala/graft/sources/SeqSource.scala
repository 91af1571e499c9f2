package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
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
  * - `SupportsPushDownAggregates` (COMPLETE pushdown): ungrouped
  *   COUNT(*)/MIN(id)/MAX(id) are answered in CLOSED FORM from the
  *   pushed [lo, hi] range — one constant row, zero rows scanned. This
  *   is the aggregate analogue of manifest-level answers (a parquet
  *   footer count, an index min/max): the scan operator disappears from
  *   the work, which at 100 TB is the difference between a metadata
  *   lookup and a full pass. Composes with filter pushdown — the range
  *   filters narrow [lo, hi] first, then the aggregate reads off the
  *   endpoints.
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
      Option(properties.get("slices")).map(_.toInt).getOrElse(8),
      Option(properties.get("columnar")).exists(_.toBoolean))
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("doc", StringType, nullable = false)))
}

private[sources] class SeqTable(n: Long, slices: Int, columnar: Boolean)
    extends Table with SupportsRead {
  override def name: String = s"graft_seq(n=$n)"
  override def schema: StructType = SeqSource.schema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices, columnar)
}

private[sources] class SeqScanBuilder(n: Long, slices: Int,
    columnar: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = n - 1
  private var required: StructType = SeqSource.schema
  private var accepted: Array[Filter] = Array.empty
  private var aggOps: Option[Seq[String]] = None

  private def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  private def translate(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val ops = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if isId(m.column) => Some("min")
      case m: Max if isId(m.column) => Some("max")
      case _ => None
    }
    if (ops.forall(_.isDefined)) Some(ops.map(_.get)) else None
  }

  // COMPLETE pushdown: Spark consumes the single result row as the final
  // answer — no partial/final aggregate pair is planned on top
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case some @ Some(_) => aggOps = some; true
      case None => false
    }

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
  override def build(): Scan = aggOps match {
    case Some(ops) => new SeqAggScan(lo, hi, ops)
    case None      => new SeqScan(lo, hi, slices, required, columnar)
  }
}

/** Closed-form answer scan for a completely-pushed aggregate: one
  * partition, one row — count = range length, min/max = the (possibly
  * filter-narrowed) endpoints; empty range → count 0, null extremes
  * (SQL's global-aggregate-over-empty semantics). */
private[sources] class SeqAggScan(lo: Long, hi: Long, ops: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(ops.zipWithIndex.map { case (op, i) =>
      StructField(s"${op}_$i", LongType, nullable = op != "count")
    })
  override def toBatch: Batch = this
  override def description: String =
    s"graft-seq-agg[$lo..$hi] ops=[${ops.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqRange(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    SeqAggReaderFactory(lo, hi, ops)
}

private[sources] case class SeqAggReaderFactory(lo: Long, hi: Long,
    ops: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val empty = hi < lo
        new GenericInternalRow(ops.map {
          case "count" => (if (empty) 0L else hi - lo + 1L): Any
          case "min"   => if (empty) null else lo
          case "max"   => if (empty) null else hi
        }.toArray[Any])
      }
      override def close(): Unit = ()
    }
}

private[sources] case class SeqRange(from: Long, until: Long) extends InputPartition

private[sources] class SeqScan(lo: Long, hi: Long, slices: Int,
    required: StructType, columnar: Boolean = false)
    extends Scan with Batch with SupportsRuntimeV2Filtering
    with SupportsReportStatistics {

  /** Size/row estimates AFTER filter pushdown (the contract's point:
    * estimates reflect the narrowed scan), so a filtered slice of a huge
    * sequence still auto-broadcasts in joins — the planner-integration
    * half of pushdown that purely row-producing sources leave on the
    * table. ~16 bytes/row: one long + a short string. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo + 1)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * 16L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  // runtime-narrowed bounds: Spark calls filter() AFTER compile-time
  // planning but BEFORE planInputPartitions() on the execution path
  // (AQE / dynamic pruning), so a broadcast join's build-side keys can
  // shrink the scan at run time — DPP for a V2 source.
  private var rlo = lo
  private var rhi = hi
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description: String =
    s"graft-seq[$lo..$hi] cols=[${required.fieldNames.mkString(",")}]" +
      (if (columnar) " columnar" else "")
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    if (columnar) Scan.ColumnarSupportMode.SUPPORTED
    else Scan.ColumnarSupportMode.UNSUPPORTED

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))
  /** Best-effort runtime narrowing: an IN predicate over `id` clamps
    * [lo, hi] to the value hull. Correctness never depends on this —
    * the join above still evaluates exactly; rows outside the IN set
    * but inside the hull just flow through — so hull-clamping (contiguous
    * ranges are all this source can skip) is the honest reduction. */
  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().length > 1) {
        val vals = p.children().toSeq.tail.flatMap {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value() match {
              case n: Number => Some(n.longValue())
              case _ => None
            }
          case _ => None
        }
        if (vals.nonEmpty) {
          rlo = math.max(rlo, vals.min)
          rhi = math.min(rhi, vals.max)
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    if (rhi < rlo) return Array.empty
    val total = rhi - rlo + 1
    val k = math.min(math.max(1L, slices.toLong), total).toInt
    // contiguous ranges, remainder spread over the first partitions
    val base = total / k; val rem = total % k
    var start = rlo
    (0 until k).map { i =>
      val len = base + (if (i < rem) 1 else 0)
      val p = SeqRange(start, start + len); start += len; p
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames, columnar)
}

/** Row- and COLUMNAR-capable reader: with `columnar=true` the source
  * emits `ColumnarBatch`es of `OnHeapColumnVector`s (4k rows per batch,
  * filled with one tight loop per column) and Spark plans the vectorized
  * scan path — `ColumnarToRow` feeds whole-stage codegen exactly as the
  * built-in parquet reader does. This is the V2 contract a columnar
  * format implements; here the "format" is synthetic, so the spec can
  * pin row/columnar result equality without fixture files. */
private[sources] class SeqReaderFactory(cols: Array[String],
    columnar: Boolean = false) extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val r = p.asInstanceOf[SeqRange]
    val schema = StructType(cols.map {
      case "id"  => StructField("id", LongType, nullable = false)
      case "doc" => StructField("doc", StringType, nullable = false)
    })
    new PartitionReader[ColumnarBatch] {
      private val batchSize = 4096
      private var cur = r.from
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (cur >= r.until) return false
        val n = math.min(batchSize.toLong, r.until - cur).toInt
        val vecs = OnHeapColumnVector.allocateColumns(n, schema)
        cols.indices.foreach { ci =>
          cols(ci) match {
            case "id" =>
              var i = 0
              while (i < n) { vecs(ci).putLong(i, cur + i); i += 1 }
            case "doc" =>
              var i = 0
              while (i < n) {
                val b = s"doc-${cur + i}".getBytes("UTF-8")
                vecs(ci).putByteArray(i, b, 0, b.length); i += 1
              }
          }
        }
        if (batch != null) batch.close()
        batch = new ColumnarBatch(vecs.toArray[ColumnVector], n)
        cur += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }

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

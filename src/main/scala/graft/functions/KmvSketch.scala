package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` — the raw-aggregation-buffer API the typed
  * `Aggregator`s ([[TopK]], [[BloomAgg]]) don't exercise: an arbitrary
  * Java object rides the aggregation buffer, with explicit
  * serialize/deserialize at the partial/final shuffle boundary.
  *
  * The sketch keeps the k smallest DISTINCT values of a Long stream
  * (callers feed a portable hash — [[PolyHash]] — so the sketch is
  * engine-reproducible). The classic estimator is then
  * (k−1)·domain/kth_min, and unlike HLL the sketch is EXACT-testable:
  * the k minima are a deterministic function of the value set, so an
  * oracle can replay them bit-for-bit — and set-union mergeability is
  * exact (merge = union + trim), giving sketch-table rollups like the
  * HLL path but with verifiable state.
  *
  * Scale shape: O(k) state per group independent of row count; partial
  * aggregation means each task ships one k-array per group across the
  * shuffle. Update is O(log k) (bounded TreeSet); merge O(k log k).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "graft_kmv: k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b.forEach(v => add(a, v))
    a
  }

  /** Sorted ascending array of the ≤k minima (exact value-set function —
    * the oracle surface). */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketch =
    copy(inputAggBufferOffset = n)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Column-API entry point: `KmvSketch(col, 32)` in an `agg(...)`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(c), k).toAggregateExpression())

  /** `graft_kmv(expr, k)` SQL registration (k a literal). */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv"),
    new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_kmv takes (expr, k)")
      val k = children(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_kmv: k must be an integer literal, got $other")
      }
      KmvSketch(children.head, k)
    })
}

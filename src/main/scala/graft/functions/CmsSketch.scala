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

/** Count-Min sketch as a native Catalyst `TypedImperativeAggregate` —
  * the frequency-estimation sibling of [[KmvSketch]] (distinct count)
  * and [[BloomAgg]] (membership): a depth×width grid of counters where
  * each of `depth` pairwise-independent-ish hash rows increments one
  * cell per update, and a key's frequency estimate is the MINIMUM of
  * its `depth` cells — never an undercount, overcounting only by
  * collision mass (the Cormode–Muthukrishnan guarantee: ε ≈ e/width
  * with probability 1−(1/e)^depth).
  *
  * Hash family (chosen for cross-engine replay, the repo's oracle
  * rule): h_i(v) = ((v mod P)·(2i+1) + i) mod P mod width with
  * P = 1e9+7 — plain 64-bit arithmetic an oracle reproduces from the
  * exact per-key counts alone, so the full grid (and therefore every
  * estimate) is bit-checkable: cell(i, c) = Σ counts of keys hashing
  * to (i, c). Callers feed nonneg Long keys (or [[PolyHash]] output).
  *
  * Scale shape: O(depth·width) state per group, INDEPENDENT of row
  * count; updates are O(depth) with no allocation; merge is cellwise
  * addition (counts are order-independent integer sums, so partial
  * aggregation is exact, not approximate-on-approximate). The classic
  * use at 100 TB: per-partition map-side sketches shuffling one small
  * grid per group instead of the raw key stream. */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, "graft_cms: depth must be in [1, 16]")
  require(width > 1, "graft_cms: width must be > 1")

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = java.lang.Math.floorMod(v.asInstanceOf[Long], P)
      var i = 0
      while (i < depth) {
        buf(i * width + (((base * (2 * i + 1) + i) % P) % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** The full grid, row-major (depth rows of `width` cells) — counts
    * are exact integer sums, so the evaluation is deterministic and the
    * oracle surface is the whole sketch, not just point estimates. */
  override def eval(buf: Array[Long]): Any = {
    val arr = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { arr(i) = buf(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (bb.remaining() >= 8 && i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketch =
    copy(inputAggBufferOffset = n)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

object CmsSketch {
  /** Column-API entry point: `CmsSketch(col, 3, 64)` in an `agg(...)`. */
  def apply(c: Column, depth: Int, width: Int): Column =
    Bridge.column(
      CmsSketch(Bridge.expression(c), depth, width).toAggregateExpression())

  /** `graft_cms(expr, depth, width)` SQL registration (literals). */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cms"),
    new ExpressionInfo(classOf[CmsSketch].getName, "graft_cms"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "graft_cms takes (expr, depth, width)")
      def intLit(e: Expression, what: String): Int = e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_cms: $what must be an integer literal, got $other")
      }
      CmsSketch(children.head, intLit(children(1), "depth"),
        intLit(children(2), "width"))
    })
}

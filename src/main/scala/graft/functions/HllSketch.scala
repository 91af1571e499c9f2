package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HyperLogLog registers as a native Catalyst `TypedImperativeAggregate`
  * — completing the mergeable-sketch trio beside [[CmsSketch]] (cellwise
  * ADD for frequencies) and [[KmvSketch]] (k-MIN for distincts): HLL is
  * register-wise MAX. Flajolet–Fuss–Gandouet–Meunier 2007: hash each
  * value, use `p` low bits to pick one of m = 2^p registers, and keep
  * per register the maximum ρ = position of the first 1-bit in the next
  * `w` hash bits. Distinct count ≈ α_m·m²/Σ2^(−M_j).
  *
  * Determinism (the repo's oracle rule): the input is a nonneg hash the
  * oracle can replay (callers feed [[PolyHash]] output), bucket/ρ are
  * plain integer arithmetic, and merge is elementwise max — order-free,
  * so partial aggregation is exact and the full register array is the
  * oracle surface (estimates derive from it in mirrored expressions).
  * PolyHash's range is [0, 1e9+7), so after dropping p = 10 bucket bits
  * the ρ-window holds v < 976 563 < 2^20: `w` must be ≤ 20, and the top
  * sliver [976 563, 2^20) never occurs — P(ρ=1) is 0.463 not 0.5, a
  * small known bias the estimator inherits (HllSketchSpec measures the
  * realized error; it stays well inside the 1.04/√m envelope for the
  * corpus sizes tested).
  *
  * Scale shape: O(m) bytes per group independent of row count, O(1)
  * update, no allocation; the classic 100 TB use is per-shard register
  * arrays persisted beside each partition and UNION-merged (elementwise
  * max) to answer corpus-wide distincts without a re-scan — the same
  * deployment as [[KmvSketch]]'s persisted minima but with fixed-size
  * state and a cheaper merge. */
case class HllSketch(
    child: Expression,
    p: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 14, "graft_hll: p must be in [4, 14]")
  require(w >= 4 && w <= 20, "graft_hll: w must be in [4, 20]")

  private val m = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll requires BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val raw = child.eval(input)
    if (raw != null) {
      val h = raw.asInstanceOf[Long]
      require(h >= 0, "graft_hll expects a nonnegative hash input")
      val bucket = (h % m).toInt
      val v = h / m
      // ρ = index (1-based, from the window's MSB) of the first 1-bit of
      // the w-bit value v; all-zero window → w + 1.
      val rho =
        if (v == 0L) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(v))
      require(rho >= 1, s"graft_hll: hash value $h exceeds the 2^${p + w} range")
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** The full register array (m values in [0, w+1]) — like [[CmsSketch]],
    * the whole sketch is the deterministic oracle surface; estimates are
    * derived from it downstream in mirrored arithmetic. */
  override def eval(buf: Array[Byte]): Any = {
    val arr = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { arr(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val buf = createAggregationBuffer()
    System.arraycopy(bytes, 0, buf, 0, math.min(bytes.length, buf.length))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HllSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketch =
    copy(inputAggBufferOffset = n)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hll"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  /** Column-API entry point: `HllSketch(col, 10, 20)` in an `agg(...)`. */
  def apply(c: Column, p: Int, w: Int): Column =
    Bridge.column(
      HllSketch(Bridge.expression(c), p, w).toAggregateExpression())

  /** α_m·m²·2^(w+1): the raw-estimate numerator as one double constant,
    * so est = [[alphaNumerator]]/S with S = Σ2^(w+1−M_j) held as an
    * exact BIGINT (registers ≤ w+1 keep every addend integral — the
    * float-sum order problem never arises). */
  def alphaNumerator(p: Int, w: Int): Double = {
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, (w + 1).toDouble)
  }

  /** `graft_hll(expr, p, w)` SQL registration (literals). */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hll"),
    new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "graft_hll takes (expr, p, w)")
      def intLit(e: Expression, what: String): Int = e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_hll: $what must be an integer literal, got $other")
      }
      HllSketch(children.head, intLit(children(1), "p"),
        intLit(children(2), "w"))
    })
}

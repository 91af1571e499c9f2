package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen Hilbert-curve index, n-ary: `n` non-negative ints
  * (2 ≤ n ≤ 8, each masked to `⌊62/n⌋` bits) mapped to their distance
  * along the n-dimensional Hilbert curve — a ≤62-bit long whose sort
  * order clusters rows that are close in ALL dimensions, like
  * [[InterleaveBits]] (Morton), but with strictly better locality:
  * consecutive Hilbert indices are always grid NEIGHBORS (unit
  * Manhattan step), where the Morton curve takes long diagonal jumps at
  * every power-of-two boundary. Fewer jumps means per-file min/max
  * ranges stay tighter on every dimension, i.e. fewer false-positive
  * files when skipping on any predicate — the reason clustering engines
  * have moved from Z-order to Hilbert for large tables. Delta's
  * `OPTIMIZE ... ZORDER BY` takes arbitrary arity; this is the same
  * surface for the Hilbert layout ([[graft.ops.Gold.hilbertBy]]).
  *
  * Two kernels, both in [[CurveOps]] (static forwarders — the generated
  * code calls them directly and the JIT inlines them, so interpreted
  * eval and codegen are bit-identical by construction):
  *  - n=2: the classic quadrant-rotation walk over the order-31 frame,
  *    kept verbatim from the original binary expression (existing
  *    two-column layouts and their specs stay stable).
  *  - n≥3: Skilling's transpose algorithm ("Programming the Hilbert
  *    curve", AIP 2004). [[HilbertIndexSpec]] pins bijectivity and the
  *    unit-step adjacency invariant for both kernels — the two
  *    properties that uniquely characterize a Hilbert traversal.
  *
  * Null-intolerant: any null input → null.
  */
case class HilbertIndex(children: Seq[Expression]) extends Expression {

  private def n: Int = children.size
  /** 62 usable bits split evenly: 31 bits/dim at n=2 (legacy frame),
    * 20 at n=3, 15 at n=4… */
  private def bitsPerDim: Int = 62 / n
  private def mask: Long = (1L << bitsPerDim) - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 2 || n > 8)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hvalue takes 2..8 arguments, got $n")
    else if (children.exists(_.dataType != IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_hvalue requires INT arguments, got (${children.map(_.dataType.sql).mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_hvalue"

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Int].toLong & mask
      i += 1
    }
    if (n == 2) CurveOps.hilbert2(xs(0), xs(1))
    else CurveOps.hilbertN(bitsPerDim, xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val loads = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else { $xs[$i] = ((long) ${e.value}) & ${mask}L; }
       """.stripMargin
    }.mkString("\n")
    val kernel =
      if (n == 2) s"graft.functions.CurveOps.hilbert2($xs[0], $xs[1])"
      else s"graft.functions.CurveOps.hilbertN($bitsPerDim, $xs)"
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = -1L;
        |long[] $xs = new long[$n];
        |$loads
        |if (!${ev.isNull}) {
        |  ${ev.value} = $kernel;
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Column-API entry point (classic two-dimension form). */
  def apply(x: Column, y: Column): Column = apply(Seq(x, y))

  /** Column-API entry point, n-ary (2..8 dims). */
  def apply(cols: Seq[Column]): Column =
    Bridge.column(HilbertIndex(cols.map(Bridge.expression)))

  /** SQL registration: `graft_hvalue(x, y, ...)` (2..8 args). */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hvalue"),
    new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hvalue"),
    (children: Seq[Expression]) => {
      require(children.size >= 2 && children.size <= 8,
        "graft_hvalue takes 2..8 arguments")
      HilbertIndex(children)
    })
}

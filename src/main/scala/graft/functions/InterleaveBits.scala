package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen Morton (Z-order) interleave, n-ary: the low
  * `⌊62/n⌋` bits of each of `n` non-negative ints (2 ≤ n ≤ 8) woven
  * into one ≤62-bit long — dimension 0 on the highest bit of each
  * group — so that sorting by the result clusters rows that are close
  * in ALL dimensions at once. For the two-column case this is
  * bit-identical to the classic 31-bits-per-dim interleave (`x` on the
  * odd bits, `y` on the even).
  *
  * This is the curve behind the reference's `OPTIMIZE ... ZORDER BY`
  * (`medallion/gold/s2g.py:98-101`): Delta computes a Z-value per row
  * (over arbitrarily many columns) and range-partitions on it;
  * [[graft.ops.Gold.zorderBy]] does the same with this expression. A
  * single-column `repartitionByRange` + sort
  * ([[graft.ops.Gold.clusterBy]]) gives perfect skipping on the leading
  * column only; the Z-value keeps Parquet footer min/max ranges tight
  * on every clustered dimension, which is what makes multi-predicate
  * data skipping work on a 100 TB fact table.
  *
  * Interpreted `eval` and generated code call the SAME static kernel
  * ([[CurveOps.mortonN]] — static forwarder, JIT-inlined inside
  * whole-stage codegen), so the two paths are bit-identical by
  * construction; inputs are masked to the per-dimension bit budget so
  * the result is always non-negative (safe under ANSI mode, stable as
  * a range-partition key). Null-intolerant: any null input → null.
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  private def n: Int = children.size
  /** 62 usable bits split evenly across dimensions: 31/31, 20/20/20, 15×4… */
  private def bitsPerDim: Int = 62 / n
  private def mask: Long = (1L << bitsPerDim) - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 2 || n > 8)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue takes 2..8 arguments, got $n")
    else if (children.exists(_.dataType != IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue requires INT arguments, got (${children.map(_.dataType.sql).mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zvalue"

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Int].toLong & mask
      i += 1
    }
    CurveOps.mortonN(bitsPerDim, xs)
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
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = -1L;
        |long[] $xs = new long[$n];
        |$loads
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.CurveOps.mortonN($bitsPerDim, $xs);
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

object InterleaveBits {
  /** Column-API entry point (classic two-dimension form). */
  def apply(x: Column, y: Column): Column = apply(Seq(x, y))

  /** Column-API entry point, n-ary (2..8 dims). */
  def apply(cols: Seq[Column]): Column =
    Bridge.column(InterleaveBits(cols.map(Bridge.expression)))

  /** SQL registration: `graft_zvalue(x, y, ...)` (2..8 args). */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zvalue"),
    new ExpressionInfo(classOf[InterleaveBits].getName, "graft_zvalue"),
    (children: Seq[Expression]) => {
      require(children.size >= 2 && children.size <= 8,
        "graft_zvalue takes 2..8 arguments")
      InterleaveBits(children)
    })
}

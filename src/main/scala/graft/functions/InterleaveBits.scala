package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen Morton (Z-order) interleave: the low 31 bits of two
  * non-negative ints woven into one 62-bit long (`x` on the odd bits,
  * `y` on the even), so that sorting by the result clusters rows that
  * are close in BOTH dimensions.
  *
  * This is the curve behind the reference's `OPTIMIZE ... ZORDER BY`
  * (`medallion/gold/s2g.py:98-101`): Delta computes a Z-value per row and
  * range-partitions on it; [[graft.ops.Gold.zorderBy]] does the same with
  * this expression. A single-column `repartitionByRange` + sort
  * ([[graft.ops.Gold.clusterBy]]) gives perfect skipping on the leading
  * column only; the Z-value keeps Parquet footer min/max ranges tight on
  * both dimensions at once, which is what makes multi-predicate data
  * skipping work on a 100 TB fact table.
  *
  * Interpreted `eval` and generated code are bit-identical; inputs are
  * masked to 31 bits so the result is always non-negative (safe under
  * ANSI mode, stable as a range-partition key).
  */
case class InterleaveBits(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue requires (INT, INT), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Int] & 0x7fffffffL
    val y = r.asInstanceOf[Int] & 0x7fffffffL
    var z = 0L
    var b = 30
    while (b >= 0) {
      z = (z << 2) | (((x >> b) & 1L) << 1) | ((y >> b) & 1L)
      b -= 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val b = ctx.freshName("b")
      s"""
         |long $x = $l & 0x7fffffffL;
         |long $y = $r & 0x7fffffffL;
         |long $z = 0L;
         |for (int $b = 30; $b >= 0; $b--) {
         |  $z = ($z << 2) | ((($x >> $b) & 1L) << 1) | (($y >> $b) & 1L);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Column-API entry point. */
  def apply(x: Column, y: Column): Column =
    Bridge.column(InterleaveBits(Bridge.expression(x), Bridge.expression(y)))

  /** SQL registration: `graft_zvalue(x, y)`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zvalue"),
    new ExpressionInfo(classOf[InterleaveBits].getName, "graft_zvalue"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_zvalue takes exactly two arguments")
      InterleaveBits(children.head, children(1))
    })
}

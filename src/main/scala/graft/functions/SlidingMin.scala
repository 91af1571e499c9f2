package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen sliding-window minimum over a LONG array: out[i] =
  * min(a[i..i+w-1]) for every full window, via the monotonic-deque
  * algorithm — O(n) total (each element enters and leaves the deque
  * once), vs the O(n·w) slice-then-array_min higher-order chain, which
  * also allocates a w-element array per window. The winnowing
  * fingerprint pass is this expression's motivating workload: there it
  * is THE per-row cost at corpus scale. Input shorter than one window →
  * empty array (callers handle the short-document fallback).
  */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull arrays are REJECTED: toLongArray() would read null
    // slots as 0 and silently corrupt the minima — fail analysis instead.
    case ArrayType(LongType, false) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_sliding_min requires ARRAY<BIGINT NOT NULL> and w > 0, " +
        s"got ${child.dataType.sql}, w=$w")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sliding_min"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData].toLongArray()
    val m = a.length - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    val dq = new Array[Int](a.length)
    var head = 0; var tail = 0; var i = 0
    while (i < a.length) {
      while (tail > head && a(dq(tail - 1)) >= a(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.freshName("a")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      s"""
         |long[] $a = $c.toLongArray();
         |int $m = $a.length - $w + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$m];
         |  int[] $dq = new int[$a.length];
         |  int $head = 0; int $tail = 0;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    while ($tail > $head && $a[$dq[$tail - 1]] >= $a[$i]) { $tail--; }
         |    $dq[$tail] = $i; $tail++;
         |    if ($dq[$head] <= $i - $w) { $head++; }
         |    if ($i >= $w - 1) { $out[$i - $w + 1] = $a[$dq[$head]]; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object SlidingMin {
  /** Column-API entry point. */
  def apply(c: Column, w: Int): Column =
    Bridge.column(SlidingMin(Bridge.expression(c), w))

  /** SQL registration: `graft_sliding_min(arr, w)` with literal w. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sliding_min"),
    new ExpressionInfo(classOf[SlidingMin].getName, "graft_sliding_min"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_sliding_min takes (array, w)")
      val w = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_sliding_min w must be a literal")
      }
      SlidingMin(children.head, w)
    })
}

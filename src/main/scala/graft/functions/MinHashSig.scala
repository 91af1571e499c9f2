package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen MinHash signature: the k permuted minima
  * min over h in hs of ((2kk+1)·h + (kk+1)·C) mod P for kk = 0..k-1,
  * over a materialized shingle-hash array. Empty input → P sentinel per
  * slot; null array elements are skipped (the HOF twin's `array_min`
  * ignores nulls).
  *
  * This is the codegen'd twin of `TextKit.minHashFromHashesHof`: the
  * higher-order form makes k separate interpreted passes over the hash
  * array (one `transform`+`array_min` per permutation — 64 array
  * allocations per row at k=64); this expression computes all k minima
  * in ONE traversal with a single long[k] accumulator and no per-element
  * allocation. At corpus scale the signature stage is pure CPU on every
  * document, so the constant factor is the difference between the scan
  * being compute-bound or not. Value-identical to the HOF form
  * (MinHashSigSpec asserts it), so oracle SQL is unchanged.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  final val P = 1000000007L
  final val C = 2654435761L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires ARRAY<BIGINT> and k > 0, got ${child.dataType.sql}, k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = Array.fill(k)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var kk = 0
        while (kk < k) {
          val v = ((2L * kk + 1) * h + (kk + 1) * C) % P
          if (v < acc(kk)) acc(kk) = v
          kk += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val kk = ctx.freshName("kk")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, ${P}L);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $kk = 0; $kk < $k; $kk++) {
         |      long $v = ((2L * $kk + 1) * $h + ($kk + 1) * ${C}L) % ${P}L;
         |      if ($v < $acc[$kk]) $acc[$kk] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k))

  /** SQL registration: `graft_minhash(hashes, k)` with a literal k. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_minhash takes (array<bigint>, k)")
      val k = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_minhash k must be a literal")
      }
      MinHashSig(children.head, k)
    })
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen SimHash: per bit i of `bits`, the majority vote of ±1
  * over bit i of every word hash, packed into a long; a bit sets when
  * its vote sum is >= 0 (so ties set the bit, and an EMPTY input sets
  * all `bits` bits — exactly the HOF twin `TextKit.simHashFromHashes`
  * semantics). Null array elements are skipped (they never occur: word
  * hashes are polyHash over non-null splits).
  *
  * Codegen'd twin of the `bits`-pass aggregate-fold chain: one traversal
  * of the hash array with a long[bits] vote accumulator instead of
  * `bits` interpreted folds per row. Value-identical (SimHashSigSpec).
  */
case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits > 0 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires ARRAY<BIGINT> and 0 < bits <= 63, got ${child.dataType.sql}, bits=$bits")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          // The HOF twin derives bit b as floor(h / 2^b) % 2, which for a
          // NEGATIVE hash is a euclidean-ish floor-division; word hashes
          // are mod-P (always >= 0), so plain shifts agree.
          votes(b) += (((h >>> b) & 1L) * 2L - 1L)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) >= 0L) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $votes = new long[$bits];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) * 2L - 1L);
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] >= 0L) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Column-API entry point. */
  def apply(c: Column, bits: Int): Column =
    Bridge.column(SimHashSig(Bridge.expression(c), bits))

  /** SQL registration: `graft_simhash(hashes, bits)` with literal bits. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_simhash takes (array<bigint>, bits)")
      val bits = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_simhash bits must be a literal")
      }
      SimHashSig(children.head, bits)
    })
}

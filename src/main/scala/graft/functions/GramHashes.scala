package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen character n-gram rolling hashes: for every length-`n`
  * byte window of the UTF-8 input, the base-31 polynomial
  * sum b[i+j]·31^(n-1-j) (no modulus — max value for n=5 ASCII is
  * ~1.2e8, far inside long). Shorter-than-n input → empty array.
  *
  * Codegen'd twin of `TextKit.gramHashesHof`: the higher-order form
  * re-reads each character through a substr+ascii chain and re-multiplies
  * the full window per position (O(L·n) interpreted node evaluations);
  * this expression walks the bytes once with the O(L) rolling update
  * h' = (h − b_out·31^(n-1))·31 + b_in. For ASCII input (the corpus and
  * the DuckDB oracle mirror) byte == char code, same as PolyHash.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n > 0 && n <= 8 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires STRING and 0 < n <= 8, got ${child.dataType.sql}, n=$n")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  private val topPow: Long = math.pow(31.0, n - 1).toLong

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val m = bytes.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < n) { h = h * 31 + (bytes(j) & 0xff); j += 1 }
    out(0) = h
    var i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xff) * topPow) * 31 + (bytes(i + n - 1) & 0xff)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $m = $bytes.length - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$m];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $n; $j++) { $h = $h * 31L + ($bytes[$j] & 0xff); }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $m; $i++) {
         |    $h = ($h - ($bytes[$i - 1] & 0xff) * ${topPow}L) * 31L + ($bytes[$i + $n - 1] & 0xff);
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  /** Column-API entry point. */
  def apply(c: Column, n: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(c), n))

  /** SQL registration: `graft_gram_hashes(text, n)` with literal n. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_gram_hashes"),
    new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_gram_hashes takes (string, n)")
      val n = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_gram_hashes n must be a literal")
      }
      GramHashes(children.head, n)
    })
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen polynomial rolling hash: h = (h*31 + byte) mod 1e9+7
  * over the UTF-8 bytes of a string.
  *
  * This is the codegen'd twin of `TextKit.polyHash` (the higher-order
  * `aggregate` fold): for ASCII input the two are value-identical (byte ==
  * code point), but this one compiles to a tight Java loop inside
  * whole-stage codegen instead of ~6 interpreted Expression-node
  * evaluations per character — the preference order the engine follows:
  * built-in functions > native `Expression` with `doGenCode` > UDF.
  * The interpreted `eval` path matches the generated code exactly, so the
  * expression is safe anywhere (including non-codegen contexts such as
  * higher-order-function lambda bodies).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  final val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column-API entry point. */
  def apply(c: Column): Column = Bridge.column(PolyHash(Bridge.expression(c)))

  /** (name, info, builder) triple for SparkSessionExtensions.injectFunction /
    * FunctionRegistry registration — makes `graft_polyhash(str)` callable
    * from SQL. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_polyhash takes exactly one argument")
      PolyHash(children.head)
    })
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Jaro-Winkler similarity (Jaro 1989; Winkler 1990) —
  * the approximate-string-match scorer the entity-resolution family
  * (SNM blocking, Fellegi-Sunter weights, golden record) uses for name
  * and address fields where edit distance over-penalizes transpositions.
  *
  * Semantics pinned to the classic formulation, verified bit-exact
  * against DuckDB's independent `jaro_winkler_similarity` on 30k fuzz
  * pairs (the oracle for `x_jaro_winkler` runs DuckDB's OWN builtin, so
  * the two engines cross-validate genuinely independent
  * implementations):
  *   - match window = max(l1, l2)/2 − 1 (integer division, can be −1 →
  *     only a 1-vs-1 exact equality can match);
  *   - transpositions = half the order-mismatches among matched chars;
  *   - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in exactly that IEEE order;
  *   - Winkler boost only when jaro > 0.7: jw = jaro + prefix·0.1·(1−jaro)
  *     with the common prefix capped at 4;
  *   - either side empty → 0.0 (the DuckDB convention, including both
  *     empty).
  *
  * Byte semantics: comparisons are over UTF-8 BYTES (exactly what
  * DuckDB's string_t implementation compares) — identical to
  * per-character on ASCII corpora; multi-byte codepoints compare
  * byte-wise on both engines, so parity holds there too.
  *
  * Scale shape: O(l1·window) per pair with two small scratch bitsets —
  * a per-row scalar inside whole-stage codegen (the generated code calls
  * the same static kernel `nullSafeEval` uses; no interpreted fallback,
  * no boxing).
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler requires STRING args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The shared kernel — called by both the interpreted path and the
    * generated code (one implementation, so the two cannot drift). */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (l1 == 1 && l2 == 1) return if (s1(0) == s2(0)) 1.0 else 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val mf = m.toDouble
    var sim = (mf / l1 + mf / l2 + (mf - t) / mf) / 3.0
    if (sim > 0.7) {
      var prefix = 0
      val pMax = math.min(4, math.min(l1, l2))
      while (prefix < pMax && s1(prefix) == s2(prefix)) prefix += 1
      sim += prefix * 0.1 * (1.0 - sim)
    }
    sim
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Registration triple: makes `graft_jaro_winkler(a, b)` callable from SQL. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_jaro_winkler takes exactly two arguments")
      JaroWinkler(children.head, children(1))
    })
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen distinct word n-gram shingles — the single-pass twin
  * of `TextKit.wordShinglesHof`'s expression chain
  * (split → transform(sequence) → n×element_at + concat_ws →
  * array_distinct), which allocates a token array, n lookups and a
  * fresh concat buffer per window plus an O(window²-ish) distinct pass
  * per document (~1.1 ms/doc measured at r13 — the shared front end of
  * the whole jaccard/minhash/LSH dedup family).
  *
  * Two structural facts make the native form cheap:
  *   - `split(text, " ")` tokens are ADJACENT byte ranges separated by
  *     single 0x20 bytes (a UTF-8 continuation byte can never equal
  *     0x20), so `concat_ws(" ", t_i..t_{i+n-1})` is exactly the
  *     substring of the input from t_i's first byte to t_{i+n-1}'s
  *     last — every shingle is a zero-copy slice of one private copy
  *     of the document bytes;
  *   - distinctness is a byte-equality set probe over those slices
  *     (UTF8String hashes/compares raw bytes), preserving FIRST-
  *     OCCURRENCE order exactly like `array_distinct`.
  *
  * Semantics pinned to the HOF twin (TextKitSpec cross-check): empty
  * tokens from leading/consecutive/trailing spaces are kept (split
  * limit -1), fewer than n tokens → empty array, null in → null out
  * (callers coalesce to empty, same as the HOF form).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n > 0 && n <= 16 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires STRING and 0 < n <= 16, got ${child.dataType.sql}, n=$n")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Shared eval/codegen kernel. One private byte copy of the input
    * (clone — the incoming UTF8String may alias a reused row/vector
    * buffer), one boundary scan, one set probe per window; emitted
    * shingles are slices of that private copy. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val b = s.clone().getBytes
    // token start offsets: tokens are [start_i, end_i) with end_i =
    // next 0x20 (or end); m tokens = separators + 1 (split limit -1
    // keeps leading/trailing/empty tokens)
    var m = 1
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) m += 1; i += 1 }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](m + 1)
    var t = 1
    i = 0
    while (i < b.length) {
      if (b(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(m) = b.length + 1 // sentinel: end of token j is starts(j+1) - 1
    val windows = m - n + 1
    val seen = new java.util.HashSet[UTF8String](windows * 2)
    val out = new java.util.ArrayList[UTF8String](windows)
    var w = 0
    while (w < windows) {
      val from = starts(w)
      val len = starts(w + n) - 1 - from
      val sh = UTF8String.fromBytes(b, from, len)
      if (seen.add(sh)) out.add(sh)
      w += 1
    }
    new GenericArrayData(out.toArray())
  }

  /** Column-API entry point. */
  def apply(c: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))

  /** SQL registration: `graft_word_shingles(text, n)` with literal n. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_word_shingles takes (string, n)")
      val n = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_word_shingles n must be a literal")
      }
      WordShingles(children.head, n)
    })
}

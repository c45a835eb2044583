package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpectsStringInput
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the media stub-feature decode
  * ([[graft.operators.Multimodal.stubFeaturesMicro]]): the input's
  * code-point stream cut into `dim` fixed windows of
  * w = max(1, ⌊numChars/dim⌋) positions (tail beyond dim·w ignored),
  * each window's code-point SUM emitted as int64.
  *
  * Why native: the composed form materializes a per-character STRING
  * ARRAY (`split(s, "")`), then runs `ascii` + an `aggregate` fold per
  * window through interpreted higher-order lambdas — for a 3k-char
  * document that is 3k single-char string allocations plus 16
  * interpreted folds, and it is the dominant cost of the media-dedup
  * corpus pass (q164). This expression walks the UTF8String's decoded
  * code points once, accumulating directly into a primitive long
  * bucket array, and compiles to one static call in whole-stage
  * codegen. Values are IDENTICAL to the composed form by construction
  * — both count positions in code points and sum code-point values —
  * so the q164 oracle and every stored artifact stay valid
  * (MultimodalSpec pins equality with the composed formula on
  * multi-byte inputs too).
  */
case class CharWindowSums(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsStringInput {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  // the entry points (Multimodal.stubFeaturesMicro and the spec) wrap
  // the child in Cast(_, StringType); the declared expectation makes a
  // mistyped child an ANALYSIS-time error instead of a runtime
  // ClassCastException for any caller that skips the cast
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_sums"

  override protected def nullSafeEval(input: Any): Any =
    CharWindowSums.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharWindowSums.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): CharWindowSums =
    copy(child = newChild)
}

object CharWindowSums {

  /** One pass over the decoded code points; positions at or beyond
    * dim·w fall outside every window and are skipped (the composed
    * form's `least(from+w, n)` clamp produces the same set). */
  def compute(s: UTF8String, dim: Int): ArrayData = {
    val str = s.toString
    val n = s.numChars()
    val w = math.max(1, n / dim)
    val cap = math.min(n.toLong, dim.toLong * w)
    val sums = new Array[Long](dim)
    var p = 0L
    var i = 0
    while (p < cap) {
      val cp = str.codePointAt(i)
      sums((p / w).toInt) += cp
      i += Character.charCount(cp)
      p += 1
    }
    ArrayData.toArrayData(sums)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpectsBinaryInput
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer feature face of [[graft.operators.JdkAvDecoder]] as a
  * native expression: payload bytes → `dim` int64 micro-unit features
  * (`round(decodeFloats · 1e6)`). Mirrors [[CharWindowSums]]'s shape —
  * one static call inside whole-stage codegen, no UDF, no per-row
  * allocation beyond the decode itself (which IS the work: ImageIO /
  * javax.sound for real containers, the byte-window rule otherwise).
  * Null payloads null out via [[UnaryExpression]]'s default null
  * handling, matching the stub expression's contract. */
case class JdkAvFeatures(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsBinaryInput {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jdk_av_features"

  override protected def nullSafeEval(input: Any): Any =
    JdkAvFeatures.compute(input.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JdkAvFeatures.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): JdkAvFeatures =
    copy(child = newChild)
}

object JdkAvFeatures {
  def compute(bytes: Array[Byte], dim: Int): ArrayData =
    ArrayData.toArrayData(
      graft.operators.JdkAvDecoder.featuresMicroCompute(bytes, dim))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExpectsStringArrayInput}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the BM25 scorers' per-term term-frequency pass:
  * `tf(t) = size(filter(toks, x => x === lit(t)))` for each query term
  * — one walk over the token array PER TERM, through interpreted
  * higher-order lambdas, in the corpus-scan stage of the inline
  * retrieval faces (q112/q160/q162) and both streaming scorers. This
  * expression counts every term in ONE walk (per token, compare
  * against the fixed term list), returning the counts in term order —
  * values identical to the per-term filter counts by construction
  * (exact binary string equality, null tokens match nothing);
  * RetrievalSpec pins equality. The |terms| stays bounded by the
  * scorers' 32-term contract, so the inner compare loop is
  * constant-size. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsStringArrayInput {

  require(terms.nonEmpty, "at least one term")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_counts"

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[ArrayData], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the term list once per plan as a codegen reference, not a
    // re-parsed literal per row
    val ref = ctx.addReferenceObj("termCountTerms", termBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  def compute(toks: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (t.binaryEquals(terms(j))) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Column API over an already-tokenized array. */
  def of(toks: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(toks), terms))
}

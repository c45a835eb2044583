package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpectsStringArrayInput
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The quality-score token statistics in ONE walk:
  * `(n, n_distinct, stop_hits)` over a token array —
  * [[graft.operators.TextAnalysis.qualityScore]]'s three inputs.
  *
  * Why native: the composed score re-tokenized the document THREE
  * times (`size(tokens)`, `size(array_distinct(tokens))`,
  * `size(filter(tokens, isInCollection))`) and paid an interpreted
  * `filter` lambda per token for the stopword test — per-document
  * work that fronts every quality face (q94's funnel stage,
  * q125/q128's adaptive gates, the q169/q170 ingest gate's quality
  * signal). This expression walks the token array once: count,
  * distinct count via a binary-equality hash set (array_distinct's
  * SQL equality — a null token counts as one distinct value), and
  * the stopword hit count against a tiny reference list.
  *
  * Values are IDENTICAL to the composition: all three outputs are
  * exact integer counts over the same token multiset (so the double
  * algebra built on them is bit-identical), null tokens count in `n`
  * and once in `n_distinct` but never as a stop hit
  * (`isInCollection` on null is null → `filter` drops it), and the
  * stopword test is binary string equality exactly like
  * `isInCollection`'s literal IN list. A null token ARRAY (null
  * text) yields a null struct — every composed component was null
  * there too. TextAnalysisSpec pins score equality against the
  * composed form. */
case class TokenStats(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsStringArrayInput {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = true),
    StructField("nd", LongType, nullable = true),
    StructField("hits", LongType, nullable = true)))
  override def prettyName: String = "token_stats"

  @transient private lazy val wordBytes: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStatsWords", wordBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  /** One-walk (n, n_distinct, stop_hits) of a token array. */
  def compute(toks: ArrayData, words: Array[UTF8String]): InternalRow = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(8, n * 2))
    var sawNull = false
    var hits = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) sawNull = true
      else {
        val t = toks.getUTF8String(i)
        seen.add(t)
        var w = 0
        while (w < words.length) {
          if (words(w).binaryEquals(t)) { hits += 1L; w = words.length }
          else w += 1
        }
      }
      i += 1
    }
    val nd = seen.size().toLong + (if (sawNull) 1L else 0L)
    new GenericInternalRow(Array[Any](n.toLong, nd, hits))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native gap-decode of one postings segment: the stored BM25 index
  * keeps each token's posting list as an id-sorted array of
  * `(gap, tf)` structs (deltas between consecutive doc ids); scoring
  * needs absolute ids back.
  *
  * Why native: the composed decode ran a RUNNING-SUM WINDOW over the
  * posexploded posting stream — `sum(gap) OVER (PARTITION BY token,
  * seg ORDER BY pos)` — which plans as Exchange + Sort + Window on
  * every stored-retrieval probe (q113/q116 and the hybrid stored
  * faces), even though the prefix sum is confined to ONE ROW's array
  * (the partition key (token, seg) IS the row key). This expression
  * rebuilds the absolute ids in one in-row scan; the explode that
  * follows carries decoded ids, so the whole Exchange+Sort+Window
  * block disappears from the probe plan.
  *
  * Values are IDENTICAL to the window form: the running sum is the
  * same left-to-right integer prefix sum (fold-order-free), and the
  * null algebra matches window `sum` — a null gap (or a null posting
  * element) contributes nothing, its own row keeps the running sum so
  * far (null if no non-null gap yet), and `tf` passes through
  * untouched. None of the null cases is ever produced by the encoder
  * (gaps come from non-null sorted ids); RetrievalSpec pins decode
  * parity against the window form on a written index. */
case class GapDecodePostings(child: Expression) extends UnaryExpression {

  private val elemType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("tf", LongType, nullable = true)))

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def prettyName: String = "gap_decode_postings"

  override protected def nullSafeEval(input: Any): Any =
    GapDecodePostings.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GapDecodePostings.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GapDecodePostings =
    copy(child = newChild)
}

object GapDecodePostings {

  /** Absolute-id postings from one gap-encoded array. */
  def compute(posts: ArrayData): ArrayData = {
    val n = posts.numElements()
    val out = new Array[Any](n)
    var sum = 0L
    var any = false
    var p = 0
    while (p < n) {
      var id: Any = if (any) java.lang.Long.valueOf(sum) else null
      var tf: Any = null
      if (!posts.isNullAt(p)) {
        val r: InternalRow = posts.getStruct(p, 2)
        if (!r.isNullAt(0)) {
          sum += r.getLong(0)
          any = true
          id = java.lang.Long.valueOf(sum)
        }
        if (!r.isNullAt(1)) tf = java.lang.Long.valueOf(r.getLong(1))
      }
      out(p) = new GenericInternalRow(Array[Any](id, tf))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `(gap, tf)` postings array → `(id, tf)` array. */
  def of(postings: Column): Column =
    ColumnBridge.column(GapDecodePostings(ColumnBridge.expression(postings)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst set-intersection size over two SORTED string arrays.
  *
  * `array_intersect` builds a hash set and materializes the intersection
  * array on every invocation — per-row allocations that dominate
  * all-pairs similarity joins (millions of calls on small arrays). This
  * expression is the engine's hot-path replacement: a zero-allocation
  * two-pointer merge count compiled into whole-stage codegen. Inputs
  * must be sorted ascending (Spark's `array_sort` / `sort_array` use
  * UTF8String binary order, which is what the merge compares with);
  * sort once per document, merge per pair.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0, $j = 0;
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |${ev.value} = 0;
         |while ($i < $na && $j < $nb) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
         |  else if ($cmp < 0) $i++;
         |  else $j++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object ArrayOps {
  /** Column API for [[SortedIntersectSize]] — both inputs must be sorted. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: plan a naive interval theta-join as a bucketed
  * equi-join.
  *
  * A join whose only cross-side predicate is `|a − b| <= tol` has no
  * equi keys, so Spark plans a nested-loop/cartesian join — quadratic
  * in the inputs and the classic scale cliff for "match events within
  * a tolerance" queries. But the predicate implies `floor(a/tol)` and
  * `floor(b/tol)` differ by at most 1, so the join is equivalent to an
  * EQUI-join on the bucket (left side bucketed once, right side
  * replicated into bucket−1/bucket/bucket+1 — each qualifying pair
  * meets on exactly one bucket value) with the original condition kept
  * as the post-match filter. This is [[graft.operators.RangeJoin]]'s
  * manual plan shape, derived automatically: users write the natural
  * theta-join and still get a shuffle-partitionable hash join.
  *
  * Scope guards:
  *  - Inner joins only (outer variants change unmatched-row semantics:
  *    the 3× replicated right side would need dedup for preserved rows).
  *  - Batch plans only: streaming joins carry watermark/state semantics
  *    the replicated Generate side would alter.
  *  - Fires only when the join has NO cross-side equi conjunct — with
  *    one, Spark already plans a hash join and the rewrite would only
  *    add a redundant key (and re-fire on RangeJoin's manual shape).
  *  - Integral (int/long) operands and a foldable positive integral
  *    tolerance — the unix-seconds/micros timelines interval joins run
  *    on. Bucketing is exact floor division via `x − pmod(x, tol)`,
  *    not float math.
  *  - Children already carrying a `_graft_bucket` column are this
  *    rule's own output (fixed-point re-entry) — skipped.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "_graft_bucket"

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Extract (leftExpr, rightExpr, tol) from `|x − y| <= tol` conjunct
    * shapes, normalized so the first element references only `left`. */
  private def rangeConjunct(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def sides(x: Expression, y: Expression, tol: Long): Option[(Expression, Expression, Long)] =
      if (!integral(x) || !integral(y) || tol <= 0) None
      else if (x.references.nonEmpty && x.references.subsetOf(left.outputSet) &&
        y.references.nonEmpty && y.references.subsetOf(right.outputSet)) Some((x, y, tol))
      else if (y.references.nonEmpty && y.references.subsetOf(left.outputSet) &&
        x.references.nonEmpty && x.references.subsetOf(right.outputSet)) Some((y, x, tol))
      else None
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(t: Long, LongType)) => sides(x, y, t)
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(t: Int, IntegerType)) => sides(x, y, t.toLong)
      case GreaterThanOrEqual(Literal(t: Long, LongType), Abs(Subtract(x, y, _), _)) => sides(x, y, t)
      case GreaterThanOrEqual(Literal(t: Int, IntegerType), Abs(Subtract(x, y, _), _)) => sides(x, y, t.toLong)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if left.resolved && right.resolved &&
          !left.isStreaming && !right.isStreaming &&
          !left.output.exists(_.name.startsWith(Marker)) &&
          !right.output.exists(_.name.startsWith(Marker)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(x, y) =>
          // both sides must actually REFERENCE a side: an empty
          // reference set is vacuously a subset of both outputs, so a
          // single-side literal conjunct (l.type = 'x') would otherwise
          // count as a cross-side equi key and suppress the rewrite —
          // leaving exactly the nested-loop join this rule removes
          // (same nonEmpty guard rangeConjunct's sides() applies)
          x.references.nonEmpty && y.references.nonEmpty &&
            ((x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet)) ||
              (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet)))
        case _ => false
      }
      val range =
        if (hasEqui) None
        else conjuncts.iterator.flatMap(rangeConjunct(_, left, right)).take(1).toList.headOption
      range match {
        case None => j
        case Some((aL, bR, tol)) =>
          val tolLit = Literal(tol, LongType)
          def toLong(e: Expression) = if (e.dataType == LongType) e else Cast(e, LongType)
          // exact floor division: (x − pmod(x, tol)) div tol (pmod is
          // non-negative, so this floors toward −∞ for negatives too)
          def bucket(x: Expression) = {
            val xl = toLong(x)
            IntegralDivide(Subtract(xl, Pmod(xl, tolLit)), tolLit)
          }
          val lB = Alias(bucket(aL), s"${Marker}_l")()
          val newLeft = Project(left.output :+ lB, left)
          val rB = bucket(bR)
          val one = Literal(1L, LongType)
          val arr = CreateArray(Seq(Subtract(rB, one), rB, Add(rB, one)))
          val rAttr = AttributeReference(s"${Marker}_r", LongType, nullable = true)()
          val newRight = Generate(Explode(arr), Nil, outer = false, None, Seq(rAttr), right)
          val newJoin = Join(newLeft, newRight, Inner,
            Some(And(EqualTo(lB.toAttribute, rAttr), cond)), hint)
          Project(j.output, newJoin)
      }
  }
}

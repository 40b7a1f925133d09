package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: plan a time/range-band join as an EQUI join.
  *
  * A join whose condition carries a band predicate
  * `abs(l - r) <= tol` (or `<`, or the mirrored `tol >= abs(...)`)
  * over integral expressions — e.g.
  * `ON abs(unix_micros(a.ts) - unix_micros(b.ts)) <= 600000000` —
  * is planned by Spark as a broadcast-nested-loop or cartesian join,
  * quadratic per key. Any pair within `tol` differs by at most one
  * `floor(x / tol)` bucket, so the join is equivalent to:
  *
  *  - left: add bucket `l div tol`
  *  - right: explode buckets `{r div tol - 1, r div tol, r div tol + 1}`
  *  - join on bucket equality (plus whatever equi keys already exist),
  *    keeping the original condition as the post-match filter.
  *
  * Each qualifying pair matches exactly once (one left bucket; three
  * DISTINCT right replicas). The rewrite only fires on inner joins
  * with integral band operands and positive literal tolerance, and
  * marks its bucket columns so it cannot re-fire on its own output.
  * Same rewrite the [[graft.operators.RangeJoin]] operator applies by
  * hand — this rule gives it to plain `spark.sql` users through
  * [[GraftExtensions]].
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private val LeftBucket = "_graft_range_lb"
  private val RightBucket = "_graft_range_rb"

  /** (leftExpr, rightExpr, tolerance) for a band conjunct, if any. */
  private def bandConjunct(
      left: LogicalPlan,
      right: LogicalPlan,
      conjuncts: Seq[Expression]): Option[(Expression, Expression, Long)] = {
    def integral(e: Expression): Boolean = e.dataType match {
      case LongType | IntegerType => true
      case _ => false
    }
    def tolOf(l: Literal): Option[Long] = l.value match {
      case i: Int if i > 0 => Some(i.toLong)
      case i: Long if i > 0 => Some(i)
      case _ => None
    }
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (a.references.subsetOf(right.outputSet) &&
        b.references.subsetOf(left.outputSet)) Some((b, a))
      else None
    def fromAbs(abs: Expression, tolLit: Literal): Option[(Expression, Expression, Long)] =
      abs match {
        case Abs(Subtract(a, b, _), _) if integral(a) && integral(b) =>
          for { t <- tolOf(tolLit); (l, r) <- sides(a, b) } yield (l, r, t)
        case _ => None
      }
    conjuncts.view.flatMap {
      case LessThanOrEqual(a @ Abs(_, _), t: Literal) => fromAbs(a, t)
      case LessThan(a @ Abs(_, _), t: Literal) => fromAbs(a, t)
      case GreaterThanOrEqual(t: Literal, a @ Abs(_, _)) => fromAbs(a, t)
      case GreaterThan(t: Literal, a @ Abs(_, _)) => fromAbs(a, t)
      case _ => None
    }.headOption
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !left.output.exists(_.name == LeftBucket) &&
          !right.output.exists(_.name == RightBucket) =>
      bandConjunct(left, right, splitConjunctivePredicates(cond)) match {
        case Some((lExpr, rExpr, tol)) =>
          val tolLit = Literal(tol)

          val lAlias = Alias(IntegralDivide(asLong(lExpr), tolLit), LeftBucket)()
          val newLeft = Project(left.output :+ lAlias, left)

          val rBucket = IntegralDivide(asLong(rExpr), tolLit)
          val replicas = CreateArray(Seq(
            Subtract(rBucket, Literal(1L)), rBucket, Add(rBucket, Literal(1L))))
          val elemNullable =
            replicas.dataType.asInstanceOf[ArrayType].containsNull
          val rAttr = AttributeReference(RightBucket, LongType, elemNullable)()
          val newRight = Generate(Explode(replicas), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(rAttr),
            child = right)

          val newCond = And(EqualTo(lAlias.toAttribute, rAttr), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite `|a − b| ≤ ε` inner joins into
  * bucketed equi-joins.
  *
  * A join whose only condition is a band predicate (`abs(l.x − r.y) <=
  * eps`) has no equi key, so Spark plans BroadcastNestedLoopJoin —
  * O(n·m) comparisons, the single worst plan shape a 100 TB query can
  * contain. But the predicate is secretly an equi-join: bucketing both
  * sides at width ε puts every qualifying pair within one bucket of
  * each other. This rule is the [[graft.ops.Joins.bandJoin]] rewrite
  * (q114) applied automatically to any user query, the way an engine
  * should fix it — in the optimizer, not the API docs:
  *
  *   left  += band(x)                       (one band per row)
  *   right += explode(band(y)−1, band(y), band(y)+1)   (3 candidates)
  *   join on band equality AND the original predicate
  *
  * Every qualifying pair meets in exactly one bucket (the left band is
  * single-valued), so no dedup stage is needed; the original predicate
  * stays as a residual, so the rewrite can only prune comparisons,
  * never change results. 3× fan-out on the right side buys an
  * equi-shuffle instead of a cartesian product.
  *
  * Scope guards (each keeps the rewrite provably exact):
  *  - integral operand types and a positive integral ε only — bands
  *    come from exact floor division ((x − pmod(x, ε)) div ε), immune
  *    to the float-rounding band-boundary hazard, and correct for
  *    negative values where `div`'s truncation is not;
  *  - inner joins with deterministic band operands;
  *  - skipped when the condition already has an equi conjunct (the
  *    join already hash-plans; adding fan-out would only hurt) — which
  *    also makes the rule a fixpoint: its own output carries the band
  *    equality.
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private object IntEps {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v, t) if isIntegral(t) =>
        val eps = v match {
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l: Long => l
          case _ => return None
        }
        if (eps > 0) Some(eps) else None
      case _ => None
    }
  }

  private object AbsDiff {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Abs(Subtract(a, b, _), _)
        if isIntegral(a.dataType) && isIntegral(b.dataType) &&
          a.deterministic && b.deterministic => Some((a, b))
      case _ => None
    }
  }

  /** A conjunct of shape abs(a − b) ≤/< eps (either literal side). */
  private object BandConjunct {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(AbsDiff(a, b), IntEps(eps)) => Some((a, b, eps))
      case LessThan(AbsDiff(a, b), IntEps(eps)) => Some((a, b, eps))
      case GreaterThanOrEqual(IntEps(eps), AbsDiff(a, b)) => Some((a, b, eps))
      case GreaterThan(IntEps(eps), AbsDiff(a, b)) => Some((a, b, eps))
      case _ => None
    }
  }

  /** Exact floor division to the band id: (x − pmod(x, ε)) div ε.
    * pmod is non-negative, so the numerator is the largest multiple of
    * ε that is ≤ x, and IntegralDivide on it is exact — floor
    * semantics even for negative x, no doubles anywhere.
    */
  private def bandOf(x: Expression, eps: Long): Expression = {
    val xl = Cast(x, LongType)
    val e = Literal(eps)
    IntegralDivide(
      Subtract(xl, Pmod(xl, e, EvalMode.LEGACY), EvalMode.LEGACY),
      e, EvalMode.LEGACY)
  }

  private def sameSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def hasEquiConjunct(conjuncts: Seq[Expression],
                              left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (sameSide(l, left) && sameSide(r, right)) ||
          (sameSide(l, right) && sameSide(r, left))
      case EqualNullSafe(l, r) =>
        (sameSide(l, left) && sameSide(r, right)) ||
          (sameSide(l, right) && sameSide(r, left))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
      if j.resolved && !hasEquiConjunct(splitConjunctivePredicates(cond), left, right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val band = conjuncts.collectFirst {
        case BandConjunct(a, b, eps) if sameSide(a, left) && sameSide(b, right) =>
          (a, b, eps)
        case BandConjunct(a, b, eps) if sameSide(a, right) && sameSide(b, left) =>
          (b, a, eps) // abs is symmetric
      }
      band match {
        case None => j
        case Some((lExpr, rExpr, eps)) =>
          val one = Literal(1L)
          val bandL = Alias(bandOf(lExpr, eps), "__band_l")()
          val newLeft = Project(left.output :+ bandL, left)
          val rBand = bandOf(rExpr, eps)
          val candidates = CreateArray(Seq(
            Subtract(rBand, one, EvalMode.LEGACY),
            rBand,
            Add(rBand, one, EvalMode.LEGACY)))
          val bandR = AttributeReference("__band_r", LongType)()
          val newRight = Generate(Explode(candidates),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bandR), child = right)
          val newCond = And(EqualTo(bandL.toAttribute, bandR), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}

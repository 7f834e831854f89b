package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite point-in-interval joins
  * (`l.t BETWEEN r.lo AND r.hi`, in any conjunct arrangement) into
  * banded equi-joins — the general range-join fix, opt-in via
  *
  *   spark.conf.set("spark.graft.rangeJoin.binSize", <n>)
  *
  * (units: seconds for timestamp operands, value units for integral
  * ones; pick ≈ the typical interval length — fan-out per interval row
  * is (hi−lo)/binSize + 2).
  *
  * A join whose only condition is a range containment has no equi key
  * and plans BroadcastNestedLoopJoin. But containment is banding: the
  * point side tags each row with its bin, the interval side explodes
  * into every bin its interval covers, and bin equality + the original
  * predicate as residual is exact — floor is monotone, so t ∈ [lo, hi]
  * puts bin(t) inside [bin(lo), bin(hi)], and each (point, interval)
  * pair meets in exactly the point's single home bin. Same integral
  * exactness discipline as [[BandJoinRule]] (timestamps band on
  * floor-seconds via Cast to long); empty intervals (lo > hi) explode
  * to zero bins. The rule bails on existing equi conjuncts (already
  * hash-planned; also the fixpoint guard), non-inner joins, and
  * non-deterministic operands, and stays dormant unless the bin size
  * is configured.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  private def isBandable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  private def toLong(e: Expression): Expression = Cast(e, LongType)

  /** Exact floor division to the bin id ((x − pmod(x, w)) div w) —
    * identical discipline to [[BandJoinRule]].
    */
  private def binOf(x: Expression, w: Long): Expression = {
    val xl = toLong(x)
    val wl = Literal(w)
    IntegralDivide(
      Subtract(xl, Pmod(xl, wl, EvalMode.LEGACY), EvalMode.LEGACY),
      wl, EvalMode.LEGACY)
  }

  /** Conjuncts normalized to "point ≥/> bound" (lower) or "point ≤/<
    * bound" (upper); both readings of each comparison are offered.
    */
  private def bounds(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case LessThan(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize =
      try SQLConf.get.getConfString(BinSizeKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (binSize <= 0) return plan

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !hasEquiConjunct(splitConjunctivePredicates(cond), left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val cands = conjuncts.flatMap(bounds).filter { case (t, b, _) =>
          isBandable(t.dataType) && isBandable(b.dataType) &&
            t.deterministic && b.deterministic &&
            ((sameSide(t, left) && sameSide(b, right)) ||
              (sameSide(t, right) && sameSide(b, left)))
        }
        val pair = (for {
          (t1, lo, true) <- cands
          (t2, hi, false) <- cands
          if t1.semanticEquals(t2) && !lo.semanticEquals(hi)
        } yield (t1, lo, hi)).headOption

        pair match {
          case None => j
          case Some((t, lo, hi)) =>
            val pointOnLeft = sameSide(t, left)
            val (pointPlan, intervalPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            val binP = Alias(binOf(t, binSize), "__bin_p")()
            val newPoint = Project(pointPlan.output :+ binP, pointPlan)
            val binLo = binOf(lo, binSize)
            val binHi = binOf(hi, binSize)
            // lo > hi → empty interval → zero candidate bins (sequence
            // with an explicit positive step rejects start > stop)
            // Sequence is time-zone-aware (timestamp sequences); it
            // resolves only with an explicit zone even on longs
            val seqExpr = new Sequence(binLo, binHi, Literal(1L))
              .withTimeZone(SQLConf.get.sessionLocalTimeZone)
            val seq = If(LessThanOrEqual(binLo, binHi),
              seqExpr,
              Literal.create(Array.empty[Long], seqExpr.dataType))
            val binI = AttributeReference("__bin_i", LongType)()
            val newInterval = Generate(Explode(seq),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binI), child = intervalPlan)
            val (newLeft, newRight) =
              if (pointOnLeft) (newPoint, newInterval)
              else (newInterval, newPoint)
            val newCond = And(EqualTo(binP.toAttribute, binI), cond)
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}

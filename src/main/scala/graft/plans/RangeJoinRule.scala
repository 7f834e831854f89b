package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite point-in-interval joins
  * (`l.t BETWEEN r.lo AND r.hi`, in any conjunct arrangement) into
  * banded equi-joins — the general range-join fix.
  *
  * Bin size selection, in priority order:
  *  1. the session conf, when set:
  *     `spark.conf.set("spark.graft.rangeJoin.binSize", <n>)`
  *     (units: seconds for timestamp operands, value units for
  *     integral ones; pick ≈ the typical interval length — fan-out per
  *     interval row is (hi−lo)/binSize + 2);
  *  2. AUTO: when the upper bound is manifestly `lo + <literal>`
  *     (e.g. `cts <= ets + INTERVAL 1 HOUR`), the literal IS the
  *     interval length, so it is also the optimal bin size (≤ 2 bins
  *     per interval row) — the rule fires with no configuration.
  *     Intervals bounded by two independent columns have no manifest
  *     width and stay dormant without the conf.
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
  * non-deterministic operands.
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

  /** Manifest interval width in band units (seconds for timestamps,
    * value units for integrals), recovered from `hi = lo + <literal>`
    * or `lo = hi − <literal>`. Sub-unit widths (e.g. a 500 ms
    * interval) floor to 0 and are reported as None (stay dormant).
    */
  private def widthOf(lo: Expression, hi: Expression): Option[Long] = {
    def units(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _) => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _: DayTimeIntervalType) => Some(v / 1000000L)
      case Literal(v: Long, _) => Some(v)
      case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval,
                   CalendarIntervalType) if ci.months == 0 =>
        Some(ci.days * 86400L + ci.microseconds / 1000000L)
      case _ => None
    }
    val w = hi match {
      case Add(x, c, _) if x.semanticEquals(lo) => units(c)
      case Add(c, x, _) if x.semanticEquals(lo) => units(c)
      case TimestampAddInterval(x, c, _) if x.semanticEquals(lo) => units(c)
      case _ => lo match {
        case Subtract(x, c, _) if x.semanticEquals(hi) => units(c)
        case _ => None
      }
    }
    w.filter(_ > 0)
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
    val confBin =
      try SQLConf.get.getConfString(BinSizeKey, "0").toLong
      catch { case _: NumberFormatException => 0L }

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
          case Some((t, lo, hi))
            if confBin <= 0 && widthOf(lo, hi).isEmpty => j
          case Some((t, lo, hi)) =>
            val binSize =
              if (confBin > 0) confBin else widthOf(lo, hi).get
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

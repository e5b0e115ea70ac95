package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a PURE-inequality time-range join into the
  * interval-bucketed EQUI-join (the e9 rewrite, [[graft.operators.Events
  * .rangeJoin]]) automatically — the (c)-rung of the extension ladder: a
  * `Rule[LogicalPlan]` for semantics the built-in planner answers with
  * BroadcastNestedLoopJoin, which is O(n·m) and a scale killer the moment
  * the interval side outgrows broadcast.
  *
  * Fires ONLY when:
  *   - `spark.graft.rangejoin.bucket` is set to the bucket width (same
  *     unit as the join columns) — unset ⇒ the rule is inert, so the
  *     blast radius of injecting it is zero;
  *   - the join is INNER and its entire condition is
  *     `x ≥/> lo AND x </≤ hi` with `x` a long column of one side and
  *     `lo`, `hi` long columns of the other (either side order).
  *
  * Rewrite: key the point side by its single bucket `x div B`, replicate
  * each interval row to the buckets it spans (`sequence(lo div B,
  * (hi−1) div B)` exploded — bounded by len/B + 1 rows), join on bucket
  * EQUALITY, and re-apply the original range predicate as a post-filter
  * (exact containment; each qualifying pair shares exactly one bucket —
  * the point's own — so the rewrite emits no duplicates). The rewritten
  * join carries an equi-condition, so this rule can never re-fire on its
  * own output.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private val BucketConf = "spark.graft.rangejoin.bucket"

  private def bucketWidth: Option[Long] =
    Option(SQLConf.get.getConfString(BucketConf, null)).flatMap(_.toLongOption).filter(_ > 0)

  /** (point, lo, hi, strictLow, strictHigh) when the condition is a pure
    * two-sided range on long attributes. */
  private def asRange(cond: Expression)
      : Option[(AttributeReference, AttributeReference, AttributeReference)] = cond match {
    case And(lower, upper) =>
      val lowOk = lower match {
        case GreaterThanOrEqual(x: AttributeReference, lo: AttributeReference) => Some((x, lo))
        case GreaterThan(x: AttributeReference, lo: AttributeReference) => Some((x, lo))
        case LessThanOrEqual(lo: AttributeReference, x: AttributeReference) => Some((x, lo))
        case LessThan(lo: AttributeReference, x: AttributeReference) => Some((x, lo))
        case _ => None
      }
      val highOk = upper match {
        case LessThan(x: AttributeReference, hi: AttributeReference) => Some((x, hi))
        case LessThanOrEqual(x: AttributeReference, hi: AttributeReference) => Some((x, hi))
        case GreaterThan(hi: AttributeReference, x: AttributeReference) => Some((x, hi))
        case GreaterThanOrEqual(hi: AttributeReference, x: AttributeReference) => Some((x, hi))
        case _ => None
      }
      (lowOk, highOk) match {
        case (Some((x1, lo)), Some((x2, hi)))
          if x1.semanticEquals(x2) && x1.dataType == LongType &&
            lo.dataType == LongType && hi.dataType == LongType => Some((x1, lo, hi))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = bucketWidth match {
    case None => plan
    case Some(width) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        asRange(cond) match {
          case Some((x, lo, hi))
            if (left.outputSet.contains(x) && right.outputSet.contains(lo)
              && right.outputSet.contains(hi)) =>
            rewrite(j, left, right, x, lo, hi, cond, width, hint, pointOnLeft = true)
          case Some((x, lo, hi))
            if (right.outputSet.contains(x) && left.outputSet.contains(lo)
              && left.outputSet.contains(hi)) =>
            rewrite(j, right, left, x, lo, hi, cond, width, hint, pointOnLeft = false)
          case _ => j
        }
    }
  }

  private def rewrite(j: Join, point: LogicalPlan, interval: LogicalPlan,
                      x: AttributeReference, lo: AttributeReference,
                      hi: AttributeReference, cond: Expression, width: Long,
                      hint: JoinHint, pointOnLeft: Boolean): LogicalPlan = {
    val b = Literal(width, LongType)
    val pBucket = Alias(IntegralDivide(x, b), "graft_rj_bucket_p")()
    val newPoint = Project(point.output :+ pBucket, point)
    // Sequence is TimeZoneAwareExpression: without a timeZoneId it reports
    // unresolved even for integer sequences, and the optimizer's plan
    // validation rejects the rewrite
    val seq = Sequence(
      IntegralDivide(lo, b),
      IntegralDivide(Subtract(hi, Literal(1L, LongType)), b),
      Some(Literal(1L, LongType)), Some(SQLConf.get.sessionLocalTimeZone))
    val iBucket = AttributeReference("graft_rj_bucket_i", LongType, nullable = false)()
    val newInterval = Generate(Explode(seq), Nil, outer = false, None, Seq(iBucket), interval)
    val bucketEq = EqualTo(pBucket.toAttribute, iBucket)
    val (l, r) = if (pointOnLeft) (newPoint, newInterval) else (newInterval, newPoint)
    Project(j.output, Filter(cond, Join(l, r, Inner, Some(bucketEq), hint)))
  }
}

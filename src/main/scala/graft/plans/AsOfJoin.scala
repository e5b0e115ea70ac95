package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class operator — the one whole-operator semantic
  * Spark's built-ins genuinely cannot express without blowing up the
  * intermediate: match each left row to the single right row with the
  * LARGEST `rightTime <= leftTime` within the same key (ties on time
  * resolved by `rightTie`, largest wins), left-outer.
  *
  * The built-in escape hatches both pay for generality:
  *   - an inequality join plans BroadcastNestedLoopJoin and produces every
  *     (left, right-at-or-before) candidate pair before a per-left argmax
  *     — O(n·m) per key, a scale killer on active keys;
  *   - the union+window trick (batch e4) needs both streams squeezed into
  *     one schema and one `last(when(...))` window column per carried
  *     right field — fine for two aligned event streams, unusable as a
  *     general two-table join.
  *
  * This node is the kdb/Pandas `asof`/`merge_asof` operator done
  * Spark-native: both sides hash-cluster on their key and sort by
  * (key, time) — exactly a sort-merge join's requirements, declared
  * through `requiredChildDistribution`/`requiredChildOrdering` so
  * EnsureRequirements plans the two exchanges and sorts — and the
  * physical operator is a single forward-only merge pass per partition:
  * O(n+m), state = ONE buffered right row, no candidate pair ever
  * materialized. At 100 TB this is two shuffles and a streaming zip —
  * the same cost as any co-partitioned join of the two tables.
  *
  * (reference semantics: Events.asofJoin / e4 — purchases matched to the
  * same user's most recent at-or-before click; this operator generalizes
  * it to arbitrary two-table payloads.)
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] → [[AsOfJoinExec]]; registered by `Graft.init` via
  * `spark.experimental.extraStrategies` (and by [[graft.GraftExtensions]]
  * for `spark.sql.extensions`-built sessions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. Children are hash-clustered on the key
  * and sorted (key, time[, tie]) — the merge keeps exactly one candidate:
  * the last right row seen for the current key with time <= the current
  * left time. Right rows for keys the (sorted) left side has moved past
  * are discarded as the pointer advances; the retained candidate is
  * `copy()`-ed because sort iterators reuse row objects.
  *
  * NULL semantics (SQL-like, validated by ExtensionsSpec): a null KEY or
  * null TIME on the left joins nothing (null-padded output row); a null
  * key or null time on the right matches nothing (row discarded as the
  * pointer passes it — ascending-nulls-first ordering puts those rows
  * before any real candidate of the same key, so the discard keeps the
  * merge forward-only). Time expressions must be LongType — checked at
  * planning, not discovered as a cast failure mid-task. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression) extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    s"as-of join time expressions must be LongType; got " +
      s"${leftTime.dataType.simpleString} / ${rightTime.dataType.simpleString}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(leftKey, lOut)
      val lTime = BindReferences.bindReference(leftTime, lOut)
      val rKey = BindReferences.bindReference(rightKey, rOut)
      val rTime = BindReferences.bindReference(rightTime, rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // input schema must carry the OUTPUT's relaxed nullability on the
      // right side: binding against the original non-nullable attributes
      // would codegen away the null checks and read the all-null pad row
      // as zeros
      val resultProj = UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      var haveKey = false
      var lastKey: Any = null
      var lastMatch: InternalRow = null

      lIter.map { l =>
        val lk = lKey.eval(l)
        val ltAny = if (lk == null) null else lTime.eval(l)
        if (lk == null || ltAny == null) {
          // null keys and null times join nothing; the ascending-nulls-
          // first sort puts them before any real row of the same key, so
          // emitting the pad without touching the right pointer is safe
          resultProj(joined(l, nullRight))
        } else {
          val lt = ltAny.asInstanceOf[Long]
          if (!haveKey || keyOrd.compare(lastKey.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef]) != 0) {
            haveKey = true
            // copy: `lk` may live inside a reused UnsafeRow buffer
            lastKey = InternalRow.copyValue(lk)
            lastMatch = null
          }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKey.eval(rBuf.head)
            if (rk == null) { rBuf.next() } // unmatched by any non-null left key
            else {
              val cmp = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
              if (cmp < 0) { rBuf.next() } // left is sorted: never needed again
              else if (cmp > 0) advancing = false
              else {
                val rt = rTime.eval(rBuf.head)
                if (rt == null) { rBuf.next() } // null time matches no left row
                else if (rt.asInstanceOf[Long] <= lt) lastMatch = rBuf.next().copy()
                else advancing = false
              }
            }
          }
          resultProj(joined(l, if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }
}

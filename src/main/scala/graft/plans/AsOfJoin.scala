package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftshim.Shim

/** Native as-of join — the full custom-operator tier (SURVEY.md §4.3
  * preference (c); guide: LogicalPlan + Strategy + SparkPlan): for each
  * left row, attach the LAST right row (in the right side's
  * (key, time, tieBreak) order) with the same key and time ≤ the left
  * row's time.
  *
  * The declared q_join_asof stays on built-ins (union+window — see
  * ops/Joins.scala); this operator is the engine-native upgrade:
  * both children are hash-clustered on the key and sorted
  * (key, time[, tie]) — EnsureRequirements inserts the exchanges/sorts —
  * then [[AsOfJoinExec]] merges co-partitioned iterators in ONE pass
  * with O(1) state (the current held match), no union row inflation, no
  * window buffering. AsOfJoinSpec pins result equality against the
  * union+window formulation on the fixture tables.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on the key — EnsureRequirements co-partitions
    * them (same machinery as sort-merge join). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Sorted (key, time) on the left; (key, time, tie...) on the right so
    * "last match wins" resolves equal-time ties deterministically. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size

    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // project to UnsafeRow (the SMJ resultProj pattern) so any parent —
      // shuffle serializer, sort, buffering exec — sees the row format it
      // expects rather than a reused mutable JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)

      new Iterator[InternalRow] {
        // one-row lookahead on the right (copied — unsafe rows are reused)
        private var rHead: InternalRow = _
        private var rHeadKey: Any = _
        private var rHeadTime: Any = _
        private var rDone = false
        advanceRight()

        // last right row matching (heldKey, time ≤ current left time)
        private var held: InternalRow = _
        private var heldKey: Any = _

        // skip right rows with null key/time: SQL join semantics — null
        // never matches, and the interpreted orderings would NPE on null
        private def advanceRight(): Unit = {
          var found = false
          while (!found && rIter.hasNext) {
            val r = rIter.next()
            val k = rKey.eval(r)
            val t = rTime.eval(r)
            if (k != null && t != null) {
              rHeadKey = k; rHeadTime = t; rHead = r.copy(); found = true
            }
          }
          if (!found) { rDone = true; rHead = null }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKey.eval(l)
          val t = lTime.eval(l)
          if (k == null || t == null) {
            // null key/time on the left never matches — null-padded row,
            // held state untouched (later left rows may still use it)
            resultProj(joined(l, nullRight))
          } else {
            if (held != null && keyOrd.compare(heldKey, k) != 0) held = null
            // consume right rows visible to this left row: key < k is
            // drained (left is key-ascending, those keys never match
            // again); key == k with time ≤ t updates the held match
            var continue = !rDone
            while (continue) {
              if (rHead == null) continue = false
              else {
                val kc = keyOrd.compare(rHeadKey, k)
                if (kc < 0) advanceRight()
                else if (kc == 0 && timeOrd.compare(rHeadTime, t) <= 0) {
                  held = rHead; heldKey = rHeadKey
                  advanceRight()
                } else continue = false
              }
              if (rDone) continue = false
            }
            resultProj(joined(l, if (held != null) held else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (the injectOptimizerRule tier, registered via
  * GraftExtensions): predicate pushdown through [[AsOfJoin]]. A custom
  * logical node is OPAQUE to Catalyst's own PushDownPredicates — without
  * this rule, any filter written above an as-of join sits above it
  * forever and the parquet scans read everything; at 100 TB that is the
  * difference between scanning a partition and scanning the lake.
  *
  * Two safe moves, both proven by the operator's semantics (output =
  * every left row + attached-or-null right columns; the attachment of a
  * left row depends only on that row's (key, time) and the right side):
  *
  *  1. A deterministic conjunct referencing only LEFT attributes
  *     commutes with the join — filtering left rows before attachment
  *     keeps exactly the same rows with identical attachments. (Only
  *     the deterministic PREFIX of the conjunction moves, matching
  *     PushDownPredicates' evaluation-order discipline.)
  *  2. A pushed-left conjunct whose ONLY reference is the left KEY
  *     also transfers to the right side with leftKey := rightKey
  *     substituted: right rows only ever attach to left rows with an
  *     EQUAL key, so right rows whose key fails the predicate can never
  *     attach to a surviving left row. The original stays on the left;
  *     the transfer additionally prunes the right scan.
  *
  * The rule joins the operator-optimization fixed point, so standard
  * pushdown carries the relocated filters the rest of the way into the
  * scans (PushedFilters — pinned in AsOfJoinSpec). */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (deterministic, rest0) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (leftOnly, keep) =
        deterministic.partition(_.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        // transfer is restricted to non-floating-point keys: ±0.0
        // compare equal under the exec's ordering while a predicate can
        // still distinguish them (same reason Spark normalizes floats
        // before join-key constraint propagation)
        val floatKey = aj.leftKey.dataType match {
          case org.apache.spark.sql.types.DoubleType |
               org.apache.spark.sql.types.FloatType => true
          case _ => false
        }
        val keyTransfers = aj.leftKey match {
          case lk: Attribute if aj.rightKey.deterministic && !floatKey =>
            leftOnly.filter(c => c.references.nonEmpty &&
                c.references.subsetOf(AttributeSet(lk)))
              .map(_.transform {
                case a: Attribute if a.semanticEquals(lk) => aj.rightKey
              })
          case _ => Nil
        }
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        val newRight = keyTransfers.reduceOption(And)
          .map(Filter(_, aj.right)).getOrElse(aj.right)
        val newJoin = aj.copy(left = newLeft, right = newRight)
        (keep ++ rest0).reduceOption(And)
          .map(Filter(_, newJoin)).getOrElse(newJoin)
      }
  }
}

/** Planner strategy mapping the logical node to the exec (registered via
  * GraftExtensions.injectPlannerStrategy — see functions package). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOfJoin.asof(events, orders, ...)` → DataFrame whose
  * plan carries the custom logical node. Columns must reference the
  * respective input frames (already-resolved attributes). */
object AsOfJoinApi {
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tieBreak: Seq[Column] = Nil): DataFrame =
    Shim.ofRows(left.sparkSession, AsOfJoin(
      Shim.logicalPlan(left), Shim.logicalPlan(right),
      Shim.expression(leftKey), Shim.expression(rightKey),
      Shim.expression(leftTime), Shim.expression(rightTime),
      tieBreak.map(Shim.expression)))
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  PredicateHelper, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native AS-OF join — the whole-operator custom-operator tier (c) of
  * the build contract: a logical node, a planner strategy, and a
  * physical operator registered through `SparkSessionExtensions`
  * (graft.plans.GraftExtensions) / `spark.experimental.extraStrategies`.
  *
  * Semantics: for every left row, attach the payload of the right row
  * sharing its key whose time is the greatest one ≤ the left time
  * (`inclusive = true`) or < it (`inclusive = false`); null payload when
  * no such row exists. The reference surface expresses this as a
  * point-in-time lookup (q_asof_last_purchase composes it from windows);
  * this operator gives it a first-class plan node.
  *
  * Scale design: both children are hash-CLUSTERED on the join key and
  * sorted within partitions by (key, time) — exactly a sort-merge join's
  * distribution contract, so Catalyst's EnsureRequirements inserts the
  * exchanges/sorts and AQE still re-plans them. Execution is then ONE
  * forward merge pass per partition: O(|L| + |R|) with O(1) state (the
  * current candidate row) — never a per-key buffer, never a window over
  * the union, and the left side streams through unbuffered regardless of
  * how many right rows share a key.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Attribute], inclusive: Boolean)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Attribute], inclusive: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // the merge preserves the left side's partitioning and order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = rightPayload
    val inclusiveB = inclusive
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // executor-side: generate the projections/orderings per partition
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val payloadProj = UnsafeProjection.create(payloadB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      // bind payload inputs as NULLABLE: unmatched left rows carry a
      // null payload row, and a projection bound to the original
      // non-nullable schema would skip the null checks
      val outProj = UnsafeProjection.create(
        output, lOut ++ payloadB.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadB.length)
      val joined = new JoinedRow
      val buffered = rIter.buffered

      var candKey: InternalRow = null
      var candTime: InternalRow = null
      var candPayload: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow)
        // consume every right row that is eligible for (lKey, lTime);
        // rows for earlier keys just roll the candidate forward and are
        // invalidated by the key check below — one forward pass total.
        // SQL null semantics: a null never equals anything, so rows
        // with null KEYS can never match (RowOrdering would compare
        // null == null), and a null right TIME is an unknown "t <= lt"
        // predicate — both are consumed without ever becoming the
        // candidate (they sort first under the nulls-first child
        // ordering, so skipping them in place preserves the merge)
        var advance = true
        while (advance && buffered.hasNext) {
          val rRow = buffered.head
          val rKey = rKeyProj(rRow)
          if (rKey.anyNull) buffered.next() // null key: never a match
          else {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc > 0) advance = false
            else {
              val rTime = rTimeProj(rRow)
              if (rTime.isNullAt(0)) buffered.next() // null time: not a candidate
              else {
                val eligible = kc < 0 || {
                  val tc = timeOrd.compare(rTime, lTime)
                  if (inclusiveB) tc <= 0 else tc < 0
                }
                if (eligible) {
                  candKey = rKey.copy()
                  candTime = rTime.copy()
                  candPayload = payloadProj(rRow).copy()
                  buffered.next()
                } else advance = false
              }
            }
          }
        }
        // a left row with a null key or null time is unconditionally
        // unmatched (null = unknown, per SQL), never null-equal-null
        val matched = !lKey.anyNull && !lTime.isNullAt(0) &&
          candKey != null && keyOrd.compare(candKey, lKey) == 0
        outProj(joined(lRow, if (matched) candPayload else nullPayload))
      }
    }
  }
}

/** Optimizer integration for the custom node: a Filter above an as-of
  * join whose predicates only touch LEFT-side columns commutes with the
  * join (the operator is left-preserving — every left row produces
  * exactly one output row, and dropping a left row cannot change any
  * other row's match). Pushing such predicates into the left child
  * lets them keep sliding down to the parquet scan (`PushedFilters`),
  * exactly what Catalyst does for built-in joins. Predicates that
  * reference the attached payload stay above the join. */
object AsofFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, payload, inc) =>
      AsofJoinExec(lk, rk, lt, rt, payload, inc, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the native as-of join. */
object Asof {
  /** Left as-of join: every left row + the named payload columns of the
    * most recent right row per key (strictly-before when
    * `inclusive = false`). The right plan is re-aliased to fresh
    * attribute ids, so self as-of joins (prev-row lookups) are safe. */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String], inclusive: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsofFilterPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofFilterPushdown
    }
    val lPlan = left.queryExecution.analyzed
    // fresh expr-ids on the right: a self-join would otherwise carry
    // ambiguous attribute references into the combined output
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${out.map(_.name).mkString(", ")}"))
    val rOut = rAliases.map(_.toAttribute)
    require(attr(lPlan.output, leftTime).dataType ==
      attr(rOut, rightTime).dataType,
      "as-of time columns must share a data type")
    // mismatched key types would hash-partition equal values to
    // DIFFERENT partitions (Murmur3 of int 5 != long 5) and mis-bind
    // the merge ordering — fail loudly instead of returning nulls
    require(leftKeys.length == rightKeys.length,
      s"as-of key arity mismatch: ${leftKeys.length} vs ${rightKeys.length}")
    leftKeys.zip(rightKeys).foreach { case (lk, rk) =>
      require(attr(lPlan.output, lk).dataType == attr(rOut, rk).dataType,
        s"as-of key columns $lk/$rk must share a data type")
    }
    ColumnBridge.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan.output, _)), rightKeys.map(attr(rOut, _)),
      attr(lPlan.output, leftTime), attr(rOut, rightTime),
      payload.map(attr(rOut, _)), inclusive))
  }
}

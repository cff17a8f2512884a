package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join — the whole-operator custom-plan ladder (SURVEY §4.3
  * rung c): LogicalPlan node + SparkStrategy + SparkPlan, registered via
  * SparkSessionExtensions.
  *
  * Semantics: for each left row, append the LATEST right row whose `on`
  * value is at-or-before the left `on` value within equal `by` keys
  * (inclusive, like DuckDB's `ASOF LEFT JOIN ... ON l.by = r.by AND
  * l.on >= r.on`); unmatched left rows keep nulls — left-outer.
  *
  * Physical shape: both sides hash-cluster on the by-keys (one exchange
  * each, aligned by EnsureRequirements) and locally sort by (by, on); a
  * per-partition streaming merge then keeps ONE buffered right row —
  * O(left + right) time, O(1) state beyond the sort. Contrast the
  * union+window encoding (rel.Relational.q47): that shuffles left+right
  * TOGETHER through one window (wide buffered frames, tag columns, a
  * post-filter); this node never materializes a window frame and never
  * rewrites the left rows at all. By-keys compare with natural null-safe
  * ordering (nulls group like groupBy); right rows with null `on` sort
  * first and so only ever match as the oldest state.
  *
  * The reference has no as-of operator (it has no joins at all); this is
  * north-star scope: point-in-time feature lookup is the canonical
  * training-data join ("state of X as of event Y") and must not be a
  * range cross-join at 100 TB.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean =
    childrenResolved &&
      leftBy.forall(_.resolved) && rightBy.forall(_.resolved) &&
      leftOn.resolved && rightOn.resolved &&
      leftBy.map(_.dataType) == rightBy.map(_.dataType) &&
      leftOn.dataType == rightOn.dataType

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsofJoin to its physical merge. */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lb, rb, lo, ro) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lo, ro) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash-cluster both sides on the by-keys; EnsureRequirements aligns the
    * two children to compatible partitionings (inserting exchanges only
    * where the existing partitioning doesn't already satisfy — a source
    * bucketed by user_id joins with zero shuffle). Empty by-keys degrade to
    * a global (single-partition) as-of. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) Seq(AllTuples, AllTuples)
    else Seq(ClusteredDistribution(leftBy), ClusteredDistribution(rightBy))

  /** Local sort (by, on) ascending on each side — the merge's only
    * precondition; already-sorted children (e.g. a previous as-of on the
    * same keys) skip the sort. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    (rightBy :+ rightOn).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftOn).map(SortOrder(_, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lBy = leftBy
    val rBy = rightBy
    val lOn = leftOn
    val rOn = rightOn
    val byTypes = lBy.map(_.dataType)
    val onType = lOn.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lBy, lOut)
      val rKeyProj = UnsafeProjection.create(rBy, rOut)
      val lOnProj = UnsafeProjection.create(Seq(lOn), lOut)
      val rOnProj = UnsafeProjection.create(Seq(rOn), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val onOrd = RowOrdering.createNaturalAscendingOrdering(Seq(onType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        // latest right row at-or-before the current left position, with the
        // by-key it was buffered under (rows stream in (by, on) order, so
        // one row of state is all the merge ever holds)
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val k = lKeyProj(lRow)
          val t = lOnProj(lRow)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val cKey = keyOrd.compare(rKeyProj(head), k)
            if (cKey < 0) {
              // right rows of earlier keys can never match this or any later
              // left row (left keys ascend) — discard
              rBuf.next()
            } else if (cKey == 0 && onOrd.compare(rOnProj(head), t) <= 0) {
              matched = rBuf.next().copy() // iterator reuses row objects
              matchedKey = rKeyProj(matched).copy()
            } else {
              advancing = false // right head is beyond the left position
            }
          }
          numOutputRows += 1
          val rSide =
            if (matched != null && keyOrd.compare(matchedKey, k) == 0) {
              numMatchedRows += 1
              matched
            } else nullRight
          resultProj(joined(lRow, rSide))
        }
      }
    }
  }
}

/** DataFrame-level API over the node. */
object Asof {
  /** `left` as-of `right`: equal by-key columns, latest `rightOn <=
    * leftOn`. Right-side attributes are re-aliased when they collide with
    * the left's (self-join lineage), so callers can as-of a frame with
    * itself. */
  def join(left: DataFrame, right: DataFrame, by: Seq[String],
      leftOn: String, rightOn: String): DataFrame =
    join(left, right, by, by, leftOn, rightOn)

  /** As above with differently-named by-keys per side (avoids duplicate
    * output column names — the native node, like Join, keeps both sides'
    * columns). */
  def join(left: DataFrame, right: DataFrame, leftBy: Seq[String],
      rightBy: Seq[String], leftOn: String, rightOn: String): DataFrame = {
    val spark = left.sparkSession
    val lPlan = GraftSqlBridge.analyzedPlan(left)
    val rPlan0 = GraftSqlBridge.analyzedPlan(right)
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).nonEmpty)
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      else rPlan0
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    GraftSqlBridge.ofRows(spark, AsofJoin(
      lPlan, rPlan,
      leftBy.map(attr(lPlan, _)), rightBy.map(attr(rPlan, _)),
      attr(lPlan, leftOn), attr(rPlan, rightOn)))
  }
}

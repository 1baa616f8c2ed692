package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._

/** Native as-of join — the whole-operator customization tier
  * (SURVEY §3): a logical node, a planner strategy, and a sort-merge
  * physical operator, registered through `extraStrategies` /
  * `SparkSessionExtensions`.
  *
  * Semantics: for every left row, attach the single right row with the
  * same key and the greatest time ≤ the left row's time (LEFT OUTER:
  * unmatched left rows keep nulls) — the DuckDB `ASOF LEFT JOIN`
  * contract the oracle uses.
  *
  * Scale design: both sides hash-cluster on the key and sort within
  * partitions by (key, time) — one shuffle each, then a streaming
  * single-pass per-partition merge with O(1) state (the last right row
  * seen per key). No windowed union materialization, no broadcast
  * requirement, skew bounded by per-key density like any sort-merge
  * join.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: Catalyst's ColumnPruning can't see through a custom
  * node, so without this a wide right/left table would be scanned in
  * full even when the query projects two columns. Inserting Projects
  * under the as-of node lets FileSourceStrategy prune the parquet
  * ReadSchema at physical planning. Idempotent (fires only while it
  * shrinks a side).
  */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, a: AsOfJoinPlan) =>
      val used = p.references ++
        AttributeSet(Seq(a.leftKey, a.leftTime, a.rightKey, a.rightTime)
          .flatMap(_.references))
      val neededL = a.left.output.filter(used.contains)
      val neededR = a.right.output.filter(used.contains)
      if (neededL.length < a.left.output.length ||
          neededR.length < a.right.output.length) {
        val newLeft = if (neededL.length < a.left.output.length)
          Project(neededL, a.left) else a.left
        val newRight = if (neededR.length < a.right.output.length)
          Project(neededR, a.right) else a.right
        p.copy(child = a.copy(left = newLeft, right = newRight))
      } else p
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lKeyExpr, lOut)
      val lTime = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lTimeExpr, lOut)
      val rKey = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rKeyExpr, rOut)
      val rTime = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rTimeExpr, rOut)
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var matchKey = Long.MinValue
      var lastMatch: InternalRow = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow).asInstanceOf[Long]
        val t = lTime.eval(lRow).asInstanceOf[Long]
        // advance the right side through every row with
        // (key, time) <= (k, t), remembering the newest per key
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val hk = rKey.eval(head).asInstanceOf[Long]
          val ht = rTime.eval(head).asInstanceOf[Long]
          if (hk < k || (hk == k && ht <= t)) {
            lastMatch = head.copy()
            matchKey = hk
            rBuf.next()
          } else advancing = false
        }
        val rMatch = if (lastMatch != null && matchKey == k) lastMatch else nullRight
        proj(joined(lRow, rMatch))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API + registration. */
object AsOfJoin {

  /** Idempotently install the planner strategy on a session (public
    * `experimental.extraStrategies` hook, so it works on any session,
    * not only ones built with `withExtensions`).
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoinColumns)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoinColumns
    }
  }

  /** Key columns must evaluate to long; time columns to long-backed
    * types (timestamp / timestamp_ntz / long) — cast beforehand
    * otherwise. Null keys/times are the caller's responsibility (as
    * with the reference semantics, entity/event keys are non-null).
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val plan = AsOfJoinPlan(
      GraftBridge.analyzedPlan(left), GraftBridge.analyzedPlan(right),
      GraftBridge.expression(left(leftKey)),
      GraftBridge.expression(left(leftTime)),
      GraftBridge.expression(right(rightKey)),
      GraftBridge.expression(right(rightTime)))
    GraftBridge.ofRows(spark, plan)
  }
}

/** `SparkSessionExtensions` installer for sessions built with
  * `.withExtensions(new GraftExtensions)` — the library-idiomatic
  * registration path (AsOfJoin.install covers pre-built sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PruneAsOfJoinColumns)
  }
}

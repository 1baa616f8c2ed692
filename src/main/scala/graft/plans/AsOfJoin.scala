package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Native as-of join — the whole-operator customization tier
  * (SURVEY §3): a logical node, a planner strategy, and a sort-merge
  * physical operator, registered through `extraStrategies` /
  * `SparkSessionExtensions`.
  *
  * Semantics: for every left row, attach the single right row with the
  * same key and the greatest time ≤ the left row's time (LEFT OUTER:
  * unmatched left rows keep nulls) — the DuckDB `ASOF LEFT JOIN`
  * contract the oracle uses. A null key or time never matches (null
  * left rows emit null right columns; null right rows are skipped),
  * matching SQL ASOF null semantics.
  *
  * Scale design: both sides hash-cluster on the key and sort within
  * partitions by (key, time) — one shuffle each, then a streaming
  * single-pass per-partition merge with O(1) state (the last right row
  * seen per key). No windowed union materialization, no broadcast
  * requirement, skew bounded by per-key density like any sort-merge
  * join.
  *
  * Hot-path shape: key/time extraction is a code-generated
  * `UnsafeProjection` per side (not interpreted `Expression.eval`),
  * the blocked right head's key/time are cached between left rows
  * (not re-evaluated per left row), and the only per-row allocation is
  * one copy per CONSUMED right row. Long-backed key/time types
  * (long/int/short/byte/date/timestamp/timestamp_ntz) take a primitive
  * comparison path; any other orderable type (string, decimal, double)
  * falls back to the type's interpreted ordering.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    forward: Boolean = false)
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
  * ReadSchema at physical planning. Fires for a Project above the
  * as-of node with any chain of Filters in between (their condition
  * references are kept). Idempotent (fires only while it shrinks a
  * side).
  */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {

  /** Descend through a chain of Filters; return the as-of node (if
    * that's what the chain bottoms out in) plus the filters' combined
    * references.
    */
  private def throughFilters(plan: LogicalPlan): Option[(AsOfJoinPlan, AttributeSet)] =
    plan match {
      case a: AsOfJoinPlan => Some((a, AttributeSet.empty))
      case Filter(cond, child) =>
        throughFilters(child).map { case (a, refs) => (a, refs ++ cond.references) }
      case _ => None
    }

  /** Rebuild the Filter chain over a replaced as-of node. */
  private def rebuild(plan: LogicalPlan, newAsOf: LogicalPlan): LogicalPlan =
    plan match {
      case _: AsOfJoinPlan => newAsOf
      case f @ Filter(_, child) => f.copy(child = rebuild(child, newAsOf))
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, child) if throughFilters(child).isDefined =>
      val (a, filterRefs) = throughFilters(child).get
      val used = p.references ++ filterRefs ++
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
        p.copy(child = rebuild(child, a.copy(left = newLeft, right = newRight)))
      } else p
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    forward: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Fixed-width long-backed types read without boxing. */
  private def longGetter(dt: DataType): Option[(InternalRow, Int) => Long] = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      Some((r, i) => r.getLong(i))
    case IntegerType | DateType => Some((r, i) => r.getInt(i).toLong)
    case ShortType => Some((r, i) => r.getShort(i).toLong)
    case ByteType => Some((r, i) => r.getByte(i).toLong)
    case _ => None
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val keyDt = lKeyExpr.dataType
    val timeDt = lTimeExpr.dataType
    val primitive = longGetter(keyDt).isDefined && longGetter(timeDt).isDefined

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd (key, time) extraction — one projection per side,
      // reused buffer, no per-row interpreted eval
      val lKt = UnsafeProjection.create(
        Seq(BindReferences.bindReference(lKeyExpr, lOut),
          BindReferences.bindReference(lTimeExpr, lOut)))
      val rKt = UnsafeProjection.create(
        Seq(BindReferences.bindReference(rKeyExpr, rOut),
          BindReferences.bindReference(rTimeExpr, rOut)))
      // right attrs must be read as nullable: unmatched left rows feed
      // an all-null right row, and a non-nullable BoundReference would
      // skip the null check and read garbage (0.0) instead
      val proj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      if (primitive) {
        val getKey = longGetter(keyDt).get
        val getTime = longGetter(timeDt).get
        // last consumed right row for the current key (already copied)
        var lastMatch: InternalRow = null
        var matchKey = 0L
        var haveMatch = false
        // blocked right head, its key/time cached until consumed
        var headRow: InternalRow = null
        var hk = 0L
        var ht = 0L

        def headReady(): Boolean = {
          while (headRow == null && rIter.hasNext) {
            val r = rIter.next()
            val kt = rKt(r)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              hk = getKey(kt, 0) // width-honest read (int-backed types)
              ht = getTime(kt, 1)
              headRow = r
            } // right rows with null key/time can never match — skip
          }
          headRow != null
        }

        lIter.map { lRow =>
          val kt = lKt(lRow)
          if (kt.isNullAt(0) || kt.isNullAt(1)) {
            proj(joined(lRow, nullRight))
          } else {
            val k = getKey(kt, 0)
            val t = getTime(kt, 1)
            var advancing = true
            while (advancing && headReady()) {
              // backward consumes rows at-or-before t (remembering the
              // newest); forward discards rows strictly before t and
              // matches the blocked head itself
              if (hk < k || (hk == k && (if (forward) ht < t else ht <= t))) {
                if (!forward) {
                  lastMatch = headRow.copy() // one copy per consumed right row
                  matchKey = hk
                  haveMatch = true
                }
                headRow = null
              } else advancing = false
            }
            val rMatch =
              if (forward) { if (headRow != null && hk == k) headRow else nullRight }
              else if (haveMatch && matchKey == k) lastMatch
              else nullRight
            proj(joined(lRow, rMatch))
          }
        }
      } else {
        // generic orderable types (string / decimal / double keys or
        // times): boxed values + interpreted orderings
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyDt))
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeDt))
        val keyRowA = new GenericInternalRow(1)
        val keyRowB = new GenericInternalRow(1)
        val timeRowA = new GenericInternalRow(1)
        val timeRowB = new GenericInternalRow(1)
        def cmpKey(a: Any, b: Any): Int = {
          keyRowA.update(0, a); keyRowB.update(0, b)
          keyOrd.compare(keyRowA, keyRowB)
        }
        def cmpTime(a: Any, b: Any): Int = {
          timeRowA.update(0, a); timeRowB.update(0, b)
          timeOrd.compare(timeRowA, timeRowB)
        }

        var lastMatch: InternalRow = null
        var matchKey: Any = null
        var haveMatch = false
        var headRow: InternalRow = null
        var hk: Any = null
        var ht: Any = null

        def headReady(): Boolean = {
          while (headRow == null && rIter.hasNext) {
            val r = rIter.next()
            val kt = rKt(r)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              hk = kt.get(0, keyDt) match {
                case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
                case v => v
              }
              ht = kt.get(1, timeDt) match {
                case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
                case v => v
              }
              headRow = r
            }
          }
          headRow != null
        }

        lIter.map { lRow =>
          val kt = lKt(lRow)
          if (kt.isNullAt(0) || kt.isNullAt(1)) {
            proj(joined(lRow, nullRight))
          } else {
            val k = kt.get(0, keyDt)
            val t = kt.get(1, timeDt)
            var advancing = true
            while (advancing && headReady()) {
              val kc = cmpKey(hk, k)
              val tc = cmpTime(ht, t)
              if (kc < 0 || (kc == 0 && (if (forward) tc < 0 else tc <= 0))) {
                if (!forward) {
                  lastMatch = headRow.copy()
                  matchKey = hk
                  haveMatch = true
                }
                headRow = null
              } else advancing = false
            }
            val rMatch =
              if (forward) { if (headRow != null && cmpKey(hk, k) == 0) headRow else nullRight }
              else if (haveMatch && cmpKey(matchKey, k) == 0) lastMatch
              else nullRight
            proj(joined(lRow, rMatch))
          }
        }
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

  /** As-of join `left` to `right`: for each left row, the latest right
    * row with equal key and right time ≤ left time (left outer) —
    * or, with `forward = true`, the EARLIEST right row with time ≥
    * left time (the DuckDB `ASOF ... ON l.t <= r.t` direction).
    *
    * Key types must match across sides and be orderable; same for time
    * types. Long-backed key/time (long/int/short/byte/date/timestamp/
    * timestamp_ntz) run the primitive merge path; other orderable
    * types (string, decimal, double) use interpreted orderings. Null
    * keys/times never match.
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lk = GraftBridge.expression(left(leftKey))
    val lt = GraftBridge.expression(left(leftTime))
    val rk = GraftBridge.expression(right(rightKey))
    val rt = GraftBridge.expression(right(rightTime))
    def check(side: String, l: Expression, r: Expression): Unit = {
      require(DataType.equalsIgnoreNullability(l.dataType, r.dataType),
        s"as-of join $side types must match: left ${l.dataType.sql} vs right ${r.dataType.sql}" +
          " — cast one side first")
      require(RowOrdering.isOrderable(l.dataType),
        s"as-of join $side type ${l.dataType.sql} is not orderable")
    }
    check("key", lk, rk)
    check("time", lt, rt)
    val plan = AsOfJoinPlan(
      GraftBridge.analyzedPlan(left), GraftBridge.analyzedPlan(right),
      lk, lt, rk, rt, forward)
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
    graft.functions.GraftFunctions.all.foreach { case (name, usage, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", null, name, usage, ""),
        builder))
    }
  }
}

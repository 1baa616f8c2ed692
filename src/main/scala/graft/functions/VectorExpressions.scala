package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two array<double> columns.
  *
  * Replaces `aggregate(zip_with(a, b, ...), 0.0, ...)`: higher-order
  * functions are interpreted (closure per element), while this
  * generates a tight Java loop inside whole-stage codegen. The
  * accumulation is the same sequential left fold, so results are
  * bit-identical to the HOF version and to DuckDB's
  * list_dot_product — oracle parity is preserved.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** All `tables` sign-LSH bucket codes of one vector in ONE compiled
  * pass — replaces the tables×bits separate dot-expression trees that
  * [[graft.operators.RandomHyperplaneLsh.bucketed]] previously
  * composed from typedlit planes + when() sums (the r9 sf10 probe
  * measured that shape collapsing past ~30 planes: 4 tables × 13 bits
  * cost 8× of 2 × 13 on HALF the candidate volume — the generated
  * projection blows the codegen budget and the HOF-free plan falls
  * apart). Planes come from the seeded integer formula
  * `w(p,d) = ((1103·(p·dim+d)+12289) mod 8191) − 4095` materialized
  * once per executor (lazy field), and each per-plane dot is the same
  * ascending-d sequential fold as [[DotProductExpr]] /
  * list_dot_product — bucket codes are bit-identical to the
  * composition they replace, so every LSH oracle replays unchanged.
  */
case class HyperplaneBucketsExpr(child: Expression, tables: Int,
    bits: Int, dim: Int) extends UnaryExpression {

  require(tables >= 1, "tables must be >= 1")
  require(bits >= 1 && bits <= 62, "bits must be in [1, 62]")
  require(dim >= 1, "dim must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(tables * bits)(p => Array.tabulate(dim)(d =>
      (((1103L * (p.toLong * dim + d) + 12289L) % 8191L) - 4095L).toDouble))

  /** Bucket code of `v` in every table (shared by eval and codegen). */
  def buckets(v: ArrayData): Array[Long] = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val w = planes(t * bits + j)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += v.getDouble(d) * w(d); d += 1 }
        if (acc >= 0) code |= (1L << j)
        j += 1
      }
      out(t) = code
      t += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buckets(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("hpBucketsExpr", this,
        classOf[HyperplaneBucketsExpr].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $expr.buckets($c));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_buckets"
}

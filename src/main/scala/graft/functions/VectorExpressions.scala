package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two array<double> (or
  * array<float>) columns.
  *
  * Replaces `aggregate(zip_with(a, b, ...), 0.0, ...)`: higher-order
  * functions are interpreted (closure per element), while this
  * generates a tight Java loop inside whole-stage codegen. The
  * accumulation is the same sequential left fold, so results are
  * bit-identical to the HOF version and to DuckDB's
  * list_dot_product — oracle parity is preserved.
  *
  * array<float> inputs (r10): each element widens to double BEFORE the
  * multiply — `(double)(float x)` is exact, so for a float-origin
  * corpus the result is bit-identical to the same dot over the
  * double-cast arrays, WITHOUT the per-row Cast allocation. The r10
  * sf100 probe measured exactly that cost: dedup_embedding's in-join
  * scoring cast both float carriers per candidate (2 × 512 B of
  * garbage × 3.2G candidates — the cast dominated the join).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> or array<float> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (fx, fy) = (isFloat(left), isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xe = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val ye = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xe * ye
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left)} * ${get(b, right)};
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

/** Per-bucket POOL scoring for LSH near-dup candidate verification —
  * the vectorized-bucket shape that keeps hot buckets off the join's
  * row machinery. Inputs: one PROBE row's float vector, precomputed
  * L2 norm and id, plus the bucket's packed pool (array<struct<id
  * bigint, vf array<float>, nrm double>>, ≤ bucketCap members).
  * Output: array<struct<id_a bigint, cos double>> of pool members
  * with `pool.id < probe id` whose exact cosine ≥ `rawThreshold`.
  *
  * Why: scoring candidates in the (tbl, bucket) equi-join looks
  * in-task, but every pool×probe match still materializes a joined
  * row (~600 B of UnsafeRow copy) BEFORE the cosine filter — at the
  * r10 sf100 probe that was 3.2G candidate rows ≈ 1.9 TB of memory
  * churn, 463 s for what is ~200 GFLOP of actual math. Packing the
  * pool ONE ROW PER BUCKET makes the join 1:1 (each probe row meets
  * exactly one packed row, read by reference), and this expression
  * loops the ≤ cap members with widened-float arithmetic — identical
  * IEEE sequence to the unpacked dot, so the oracle is unchanged.
  *
  * `rawThreshold` is a CONSERVATIVE pre-filter: callers that publish
  * `round(cos, 4) ≥ t` pass `t − 1e-4` here (4-dp rounding moves a
  * value by ≤ 5e-5, so no survivor is lost) and apply the exact
  * rounded filter on the (rare) exploded survivors.
  */
case class LshPoolMatchesExpr(vec: Expression, nrm: Expression,
    id: Expression, pool: Expression, rawThreshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = nrm
  override def third: Expression = id
  override def fourth: Expression = pool

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val pOk = pool.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && fs(2).dataType == DoubleType &&
          (fs(1).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vOk && nrm.dataType == DoubleType && id.dataType == LongType && pOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, double, bigint, " +
        s"array<struct<id bigint, vf array<float>, nrm double>>), got " +
        s"(${vec.dataType.catalogString}, ${nrm.dataType.catalogString}, " +
        s"${id.dataType.catalogString}, ${pool.dataType.catalogString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean =
    vec.nullable || nrm.nullable || id.nullable || pool.nullable

  override protected def nullSafeEval(vAny: Any, nAny: Any, idAny: Any,
      pAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val nb = nAny.asInstanceOf[Double]
    val idB = idAny.asInstanceOf[Long]
    val members = pAny.asInstanceOf[ArrayData]
    val dim = v.numElements()
    // read the probe vector once into a primitive buffer (widened) —
    // the inner loop then streams only the pool member's floats
    val vb = new Array[Double](dim)
    var d = 0
    while (d < dim) { vb(d) = v.getFloat(d).toDouble; d += 1 }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val m = members.numElements()
    var i = 0
    while (i < m) {
      val row = members.getStruct(i, 3)
      val idA = row.getLong(0)
      if (idA < idB) {
        val va = row.getArray(1)
        val na = row.getDouble(2)
        val n = math.min(dim, va.numElements())
        var acc = 0.0
        var j = 0
        while (j < n) { acc += va.getFloat(j).toDouble * vb(j); j += 1 }
        val cos = acc / (na * nb)
        if (cos >= rawThreshold)
          out += org.apache.spark.sql.catalyst.InternalRow(idA, cos)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): LshPoolMatchesExpr =
    copy(vec = newFirst, nrm = newSecond, id = newThird, pool = newFourth)

  override def prettyName: String = "graft_lsh_pool_matches"
}

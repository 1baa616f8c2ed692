package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native top-`b` nearest centroids: for a vector `v` and a packed
  * centroid array `cents: array<struct<cid: long, cv: array<double>,
  * cc: double>>` (cc = cv·cv, precomputed at pack time), returns the
  * `b` centroid ids with smallest `(d2, cid)` where
  * `d2 = (v·v − 2·v·cv) + cc` — exactly the
  * `array_min(transform(cents, c -> struct(d2, cid)))` /
  * `slice(array_sort(...), 1, b)` ordering the HOF shape used,
  * including float-op order (each dot is the same sequential fold as
  * [[DotProductExpr]], so assignments are bit-identical and DuckDB
  * oracles replay unchanged).
  *
  * WHY an expression and not the HOF: lambda bodies inside
  * `transform` evaluate INTERPRETED — per (row, centroid) that was 3
  * expression-tree walks plus a struct allocation, and `array_min`/
  * `array_sort` materialize all |cents| structs per row. The r8 sf1
  * probe measured the flat-assignment branch of HnswLite at 18.7 s
  * for 25M (row × centroid) pairs — almost entirely interpreter
  * overhead. This generates one fused Java loop (v·v hoisted per row,
  * cc hoisted per centroid at pack time, top-b kept in two scratch
  * arrays) inside whole-stage codegen; the same work runs at memory
  * bandwidth. Everything built on [[graft.operators.IvfIndex
  * .assignOne]] — IVF list builds, Lloyd iterations, PQ/IVF-PQ
  * training, HnswLite routing — rides this loop.
  */
case class NearestCentroidsExpr(left: Expression, right: Expression, b: Int)
    extends BinaryExpression {

  require(b >= 1, s"b must be >= 1, got $b")

  private val centType = ArrayType(StructType(Seq(
    StructField("cid", LongType),
    StructField("cv", ArrayType(DoubleType)),
    StructField("cc", DoubleType))))

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && fs(2).dataType == DoubleType &&
          (fs(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vOk && cOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<struct<cid bigint, " +
        s"cv array<double>, cc double>>), got ${left.dataType.catalogString} " +
        s"and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(vAny: Any, cAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val cents = cAny.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < nv) { vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    val nc = cents.numElements()
    val bs = new Array[Double](b)
    val bi = new Array[Long](b)
    var filled = 0
    var ci = 0
    while (ci < nc) {
      val cr = cents.getStruct(ci, 3)
      val cid = cr.getLong(0)
      val cv = cr.getArray(1)
      val cc = cr.getDouble(2)
      val n = math.min(nv, cv.numElements())
      var vc = 0.0
      i = 0
      while (i < n) { vc += v.getDouble(i) * cv.getDouble(i); i += 1 }
      val d = (vv - 2.0 * vc) + cc
      var pos = filled
      while (pos > 0 && (bs(pos - 1) > d || (bs(pos - 1) == d && bi(pos - 1) > cid))) pos -= 1
      if (pos < b) {
        var j = math.min(filled, b - 1)
        while (j > pos) { bs(j) = bs(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bs(pos) = d; bi(pos) = cid
        if (filled < b) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(bi.take(filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val nv = ctx.freshName("nv")
      val vv = ctx.freshName("vv")
      val nc = ctx.freshName("nc")
      val bs = ctx.freshName("bs")
      val bi = ctx.freshName("bi")
      val filled = ctx.freshName("filled")
      val ci = ctx.freshName("ci")
      val cr = ctx.freshName("cr")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val cc = ctx.freshName("cc")
      val n = ctx.freshName("n")
      val vc = ctx.freshName("vc")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |int $nv = $v.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  $vv += $v.getDouble($i) * $v.getDouble($i);
         |}
         |int $nc = $cents.numElements();
         |double[] $bs = new double[$b];
         |long[] $bi = new long[$b];
         |int $filled = 0;
         |for (int $ci = 0; $ci < $nc; $ci++) {
         |  org.apache.spark.sql.catalyst.InternalRow $cr = $cents.getStruct($ci, 3);
         |  long $cid = $cr.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cr.getArray(1);
         |  double $cc = $cr.getDouble(2);
         |  int $n = java.lang.Math.min($nv, $cv.numElements());
         |  double $vc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $vc += $v.getDouble($i) * $cv.getDouble($i);
         |  }
         |  double $d = ($vv - 2.0 * $vc) + $cc;
         |  int $pos = $filled;
         |  while ($pos > 0 && ($bs[$pos - 1] > $d ||
         |      ($bs[$pos - 1] == $d && $bi[$pos - 1] > $cid))) $pos--;
         |  if ($pos < $b) {
         |    for (int $j = java.lang.Math.min($filled, $b - 1); $j > $pos; $j--) {
         |      $bs[$j] = $bs[$j - 1]; $bi[$j] = $bi[$j - 1];
         |    }
         |    $bs[$pos] = $d; $bi[$pos] = $cid;
         |    if ($filled < $b) $filled++;
         |  }
         |}
         |long[] $out = new long[$filled];
         |System.arraycopy($bi, 0, $out, 0, $filled);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_nearest_centroids"
}

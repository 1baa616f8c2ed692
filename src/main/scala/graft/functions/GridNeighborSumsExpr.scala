package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Packed-pool neighbor sums for the flocking broad phase (A12).
  *
  * The pair-materializing shape — SpatialGrid.neighborPairs →
  * symmetrize → attach-join → groupBy — died on disk at sf100: with
  * a FIXED coordinate box, 10x points means ~10x in-radius neighbors
  * per point, so the true near-pair set grows ~100x per decade
  * (~20G pair rows at 15M entities) and no equi-join that emits it
  * as rows survives. Flocking only needs per-point NEIGHBOR SUMS, so
  * the quadratic stays CPU: cells pack into one row per cell
  * (collect_list), each cell joins its 9-cell block's pools
  * (pool-to-pool, O(cells·9) rows), and this expression scans
  * center x neighbor in-task, emitting one partial-sum entry per
  * center point — O(points) rows out, never O(pairs).
  *
  * Left: center cell pool, right: one neighbor-block pool, both
  * array<struct<id:long, x,y,vx,vy:double>>. Returns
  * array<struct<id:long, n:long, sx,sy,svx,svy:double>> with one
  * entry per center point having >= 1 neighbor (id-inequality
  * excludes self when the neighbor pool IS the center pool). Sums
  * are exact — order-independent — whenever the inputs are
  * integer-valued doubles (A12 seeds are; the oracle relies on it).
  */
case class GridNeighborSumsExpr(left: Expression, right: Expression,
    radius2: Double) extends BinaryExpression with CodegenFallback {

  private val memberType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("vx", DoubleType, nullable = false),
    StructField("vy", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StructType, _), ArrayType(_: StructType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<struct> pools, got $other")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", DoubleType, nullable = false),
    StructField("sy", DoubleType, nullable = false),
    StructField("svx", DoubleType, nullable = false),
    StructField("svy", DoubleType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(centerAny: Any, poolAny: Any): Any = {
    val center = centerAny.asInstanceOf[ArrayData]
    val pool = poolAny.asInstanceOf[ArrayData]
    val na = center.numElements()
    val nb = pool.numElements()
    // unpack to primitive arrays once; the hot loop is na*nb
    val aid = new Array[Long](na)
    val ax = new Array[Double](na); val ay = new Array[Double](na)
    var i = 0
    while (i < na) {
      val r = center.getStruct(i, 5)
      aid(i) = r.getLong(0); ax(i) = r.getDouble(1); ay(i) = r.getDouble(2)
      i += 1
    }
    val bid = new Array[Long](nb)
    val bx = new Array[Double](nb); val by = new Array[Double](nb)
    val bvx = new Array[Double](nb); val bvy = new Array[Double](nb)
    var j = 0
    while (j < nb) {
      val r = pool.getStruct(j, 5)
      bid(j) = r.getLong(0); bx(j) = r.getDouble(1); by(j) = r.getDouble(2)
      bvx(j) = r.getDouble(3); bvy(j) = r.getDouble(4)
      j += 1
    }
    val n = new Array[Long](na)
    val sx = new Array[Double](na); val sy = new Array[Double](na)
    val svx = new Array[Double](na); val svy = new Array[Double](na)
    i = 0
    while (i < na) {
      val xi = ax(i); val yi = ay(i); val idi = aid(i)
      var nn = 0L; var tx = 0.0; var ty = 0.0; var tvx = 0.0; var tvy = 0.0
      j = 0
      while (j < nb) {
        val dx = xi - bx(j); val dy = yi - by(j)
        if (dx * dx + dy * dy <= radius2 && bid(j) != idi) {
          nn += 1L; tx += bx(j); ty += by(j); tvx += bvx(j); tvy += bvy(j)
        }
        j += 1
      }
      n(i) = nn; sx(i) = tx; sy(i) = ty; svx(i) = tvx; svy(i) = tvy
      i += 1
    }
    var outN = 0
    i = 0
    while (i < na) { if (n(i) > 0L) outN += 1; i += 1 }
    val out = new Array[Any](outN)
    var k = 0
    i = 0
    while (i < na) {
      if (n(i) > 0L) {
        out(k) = InternalRow(aid(i), n(i), sx(i), sy(i), svx(i), svy(i))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GridNeighborSumsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_grid_neighbor_sums"
}

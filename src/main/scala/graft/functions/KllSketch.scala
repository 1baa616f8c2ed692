package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** KLL-style streaming quantile sketch (Karnin, Lang, Liberty 2016 —
  * the compactor-hierarchy construction; this variant keeps a fixed
  * capacity k per level and DETERMINISTIC alternating compaction
  * offsets instead of coin flips, trading the randomized unbiasedness
  * proof for reproducibility — the rank-error bound that matters,
  * ≈ levels·n/(2k), still holds under any merge order).
  *
  * Level i holds items of weight 2^i; a full level sorts, keeps every
  * other item (offset alternating per compaction), and promotes the
  * keepers one level up. Sketch size is O(k·log(n/k)) regardless of
  * input size, and merge is level-wise concatenation + the same
  * compaction — so partial sketches combine map-side and the shuffle
  * carries kilobytes per group, the same scale story as HLL/CMS/Bloom.
  */
object KllOps {

  /** levels(i) = items with weight 2^i; flips(i) alternates the
    * compaction offset so dropped ranks don't bias one direction.
    */
  final class Buf(val levels: ArrayBuffer[ArrayBuffer[Double]],
      val flips: ArrayBuffer[Boolean], var n: Long) {
    def level(i: Int): ArrayBuffer[Double] = {
      while (levels.size <= i) { levels += ArrayBuffer.empty[Double]; flips += false }
      levels(i)
    }
  }

  def empty(): Buf = new Buf(ArrayBuffer(ArrayBuffer.empty[Double]),
    ArrayBuffer(false), 0L)

  def update(buf: Buf, k: Int, v: Double): Unit = {
    buf.level(0) += v
    buf.n += 1
    if (buf.levels(0).size >= k) compactCascade(buf, k)
  }

  private def compactCascade(buf: Buf, k: Int): Unit = {
    var i = 0
    while (i < buf.levels.size) {
      if (buf.levels(i).size >= k) {
        val sorted = buf.levels(i).sorted
        val offset = if (buf.flips(i)) 1 else 0
        buf.flips(i) = !buf.flips(i)
        val up = buf.level(i + 1) // materializes level i+1 first
        var j = offset
        while (j < sorted.size) { up += sorted(j); j += 2 }
        buf.levels(i).clear()
      }
      i += 1
    }
  }

  def merge(a: Buf, b: Buf, k: Int): Buf = {
    var i = 0
    while (i < b.levels.size) {
      a.level(i) ++= b.levels(i)
      i += 1
    }
    a.n += b.n
    compactCascade(a, k)
    a
  }

  /** Smallest value whose cumulative weight reaches q of the total. */
  def quantile(buf: Buf, q: Double): Double = {
    val pairs = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.size) {
      val w = 1L << i
      buf.levels(i).foreach(v => pairs += ((v, w)))
      i += 1
    }
    if (pairs.isEmpty) return Double.NaN
    val sorted = pairs.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var j = 0
    while (j < sorted.size) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4 + 8
    buf.levels.foreach(l => bytes += 4 + 1 + 8 * l.size)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.levels.size)
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.levels.size) {
      bb.putInt(buf.levels(i).size)
      bb.put(if (buf.flips(i)) 1.toByte else 0.toByte)
      buf.levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    val n = bb.getLong
    val levels = ArrayBuffer.empty[ArrayBuffer[Double]]
    val flips = ArrayBuffer.empty[Boolean]
    var i = 0
    while (i < nLevels) {
      val sz = bb.getInt
      flips += (bb.get() == 1.toByte)
      val l = new ArrayBuffer[Double](sz)
      var j = 0
      while (j < sz) { l += bb.getDouble; j += 1 }
      levels += l
      i += 1
    }
    new Buf(levels, flips, n)
  }
}

/** `graft_kll(col, q[, k])` — approximate q-quantile of a double
  * column via the KLL compactor sketch.
  */
case class KllAggregate(
    child: Expression,
    q: Double,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllOps.Buf] {

  require(q > 0.0 && q < 1.0, "quantile q must be in (0, 1)")
  require(k >= 8 && k <= 65536, "k in [8, 65536]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE column, got ${child.dataType.catalogString} — cast first")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): KllOps.Buf = KllOps.empty()

  override def update(buf: KllOps.Buf, input: InternalRow): KllOps.Buf = {
    val v = child.eval(input)
    if (v != null) KllOps.update(buf, k, v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllOps.Buf, b: KllOps.Buf): KllOps.Buf =
    KllOps.merge(a, b, k)

  override def eval(buf: KllOps.Buf): Any = KllOps.quantile(buf, q)

  override def serialize(buf: KllOps.Buf): Array[Byte] = KllOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KllOps.Buf = KllOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAggregate =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kll"
}

object KllFunctions {
  import org.apache.spark.sql.GraftBridge

  /** Approximate q-quantile of a double column (KLL sketch). */
  def kllQuantile(col: Column, q: Double, k: Int = 400): Column =
    GraftBridge.column(
      KllAggregate(GraftBridge.expression(col), q, k).toAggregateExpression())
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.types._

/** Bloom-filter build/probe pair (Bloom 1970; Kirsch & Mitzenmacher
  * 2006 double hashing), the runtime-filter workhorse at 100 TB:
  * aggregate the JOIN KEY DOMAIN of a small/filtered dimension into a
  * fixed-size bitset (partials OR-merge map-side, so the shuffle
  * carries one buffer per group), broadcast the resulting binary, and
  * probe it row-by-row on the fact side BEFORE the join/shuffle —
  * rows that can't match never leave the scan stage. No false
  * negatives by construction; false-positive rate is sized by
  * numBits/numHashes.
  *
  * Buffer layout: byte 0 = numHashes k, bytes 1.. = the bitset —
  * self-describing, so the probe expression needs no parameters
  * beyond the filter bytes themselves.
  */
object BloomOps {
  val SeedA = 77L
  val SeedB = 1000003L

  def emptyBuffer(numBits: Int, numHashes: Int): Array[Byte] = {
    val buf = new Array[Byte](1 + (numBits + 7) / 8)
    buf(0) = numHashes.toByte
    buf
  }

  /** Double hashing: bit_i = (h1 + i·h2) mod m, i in [0, k). */
  def set(buf: Array[Byte], h1: Long, h2: Long): Unit = {
    val k = buf(0) & 0xff
    val m = (buf.length - 1) << 3
    var i = 0
    while (i < k) {
      val idx = (((h1 + i * h2) & Long.MaxValue) % m).toInt
      buf(1 + (idx >> 3)) = (buf(1 + (idx >> 3)) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  def mightContainHashed(buf: Array[Byte], h1: Long, h2: Long): Boolean = {
    val k = buf(0) & 0xff
    val m = (buf.length - 1) << 3
    var i = 0
    while (i < k) {
      val idx = (((h1 + i * h2) & Long.MaxValue) % m).toInt
      if ((buf(1 + (idx >> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Probe entry point shared by eval and generated code (the value
    * arrives boxed from codegen's autoboxing call site).
    */
  def mightContain(buf: Array[Byte], value: Any, dt: DataType): Boolean =
    mightContainHashed(buf,
      XxHash64Function.hash(value, dt, SeedA),
      XxHash64Function.hash(value, dt, SeedB))
}

/** Aggregates a column's values into a Bloom filter; returns the
  * filter as BINARY (probe it with [[BloomContainsExpr]]).
  */
case class BloomAggregate(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 64 && numBits <= (1 << 28), "numBits in [64, 2^28]")
  require(numHashes >= 1 && numHashes <= 16, "numHashes in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    BloomOps.emptyBuffer(numBits, numHashes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      BloomOps.set(buf,
        XxHash64Function.hash(v, child.dataType, BloomOps.SeedA),
        XxHash64Function.hash(v, child.dataType, BloomOps.SeedB))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // byte 0 is k on both sides (identical by construction); OR of the
    // bitset bytes is a no-op on it
    var i = 1
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAggregate =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom"
}

/** `graft_bloom_contains(filter, value)` — codegen'd membership probe
  * against a [[BloomAggregate]] binary. Stays inside whole-stage
  * codegen so a broadcast runtime filter costs two hashes + k bit
  * tests per fact row, no virtual calls in the hot loop beyond the
  * shared static helper.
  */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter argument must be BINARY (a graft_bloom result), " +
          s"got ${left.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(filter: Any, value: Any): Any =
    BloomOps.mightContain(filter.asInstanceOf[Array[Byte]], value, right.dataType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtRef = ctx.addReferenceObj("bloomProbeType", right.dataType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (filter, value) =>
      // the value autoboxes at the call site; hashing matches the
      // aggregate's build-side seeds exactly
      s"${ev.value} = graft.functions.BloomOps.mightContain($filter, $value, $dtRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}

object BloomFunctions {
  import org.apache.spark.sql.GraftBridge

  /** Build a Bloom filter over `col` (returns BINARY). */
  def bloom(col: Column, numBits: Int = 1 << 17, numHashes: Int = 7): Column =
    GraftBridge.column(
      BloomAggregate(GraftBridge.expression(col), numBits, numHashes)
        .toAggregateExpression())

  /** Probe a filter built by [[bloom]]. */
  def bloomContains(filter: Column, value: Column): Column =
    GraftBridge.column(
      BloomContainsExpr(GraftBridge.expression(filter), GraftBridge.expression(value)))
}

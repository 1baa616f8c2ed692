package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.types._

/** Sketch aggregates for 100 TB-scale approximate analytics, built as
  * native `TypedImperativeAggregate`s (partial sketches merge on the
  * map side; the shuffle carries one fixed-size buffer per group
  * instead of the raw values — the whole point at scale).
  *
  * Both follow the published constructions only:
  *  - HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) with the
  *    standard linear-counting small-range correction.
  *  - Count-Min Sketch (Cormode, Muthukrishnan 2005), point query =
  *    min over depth rows.
  * Hashing is Spark's own XxHash64 of the child value with per-use
  * seeds.
  */
object SketchAggregates {

  import org.apache.spark.sql.GraftBridge

  /** `approx_count_distinct`-style HLL with 2^p registers. */
  def hll(col: Column, precision: Int = 12): Column =
    GraftBridge.column(
      HllAggregate(GraftBridge.expression(col), precision).toAggregateExpression())

  /** Count-Min point estimate of `col = value` occurrences. */
  def cmsEstimate(col: Column, value: Column, depth: Int = 5, width: Int = 2048): Column =
    GraftBridge.column(
      CmsAggregate(GraftBridge.expression(col), GraftBridge.expression(value),
        depth, width).toAggregateExpression())

  /** Misra-Gries heavy-hitters summary: map of ≤ capacity surviving
    * keys → estimated counts.
    */
  def topK(col: Column, capacity: Int): Column =
    GraftBridge.column(
      TopKAggregate(GraftBridge.expression(col), capacity).toAggregateExpression())
}

/** The HLL register algebra, shared by the batch aggregate and the
  * streaming mapGroupsWithState maintainer — identical hashing and
  * register updates mean a sketch maintained incrementally across
  * micro-batches is byte-equal to one aggregated in batch (register
  * max-merge is order- and partitioning-insensitive).
  */
object HllSketch {
  /** The aggregate's hash of a long child value (seed 42). */
  def hashLong(v: Long): Long =
    XxHash64Function.hash(v, LongType, 42L)

  def emptyBuffer(precision: Int): Array[Byte] = new Array[Byte](1 << precision)

  /** Fold one hashed value into the registers. */
  def updateHashed(buf: Array[Byte], precision: Int, h: Long): Unit = {
    val idx = (h >>> (64 - precision)).toInt
    val w = h << precision
    // rank = position of the leftmost 1-bit in the suffix (1-based);
    // all-zero suffix gets the max rank
    val rank = (if (w == 0L) 64 - precision else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > buf(idx)) buf(idx) = rank.toByte
  }

  /** Register-wise max merge into `a`. */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Bias-corrected harmonic-mean estimate with linear counting below
    * 2.5·m (Flajolet et al. 2007).
    */
  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}

/** HyperLogLog distinct-count sketch over any hashable column.
  * Buffer = 2^precision byte registers; estimate = bias-corrected
  * harmonic mean with linear counting below 2.5·m.
  */
case class HllAggregate(
    child: Expression,
    precision: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(precision >= 4 && precision <= 16, "precision must be in [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] =
    HllSketch.emptyBuffer(precision)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllSketch.updateHashed(buf, precision,
        XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllSketch.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = HllSketch.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAggregate =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hll"
}

/** The CMS counter algebra, shared by the batch aggregate and the
  * streaming mapGroupsWithState maintainer — identical hashing and
  * counter addition mean a sketch maintained incrementally across
  * micro-batches is value-equal to one aggregated in batch (counter
  * sum is order- and partitioning-insensitive).
  */
object CmsSketch {
  def empty(depth: Int, width: Int): Array[Long] = new Array[Long](depth * width)

  /** Bucket of a LONG item in counter row `row` (the aggregate's
    * hashing for a LongType child, seed 1000003·(row+1)).
    */
  def bucketLong(v: Long, row: Int, width: Int): Int = {
    val h = XxHash64Function.hash(v, LongType, 1000003L * (row + 1))
    ((h % width + width) % width).toInt
  }

  def updateLong(buf: Array[Long], depth: Int, width: Int, v: Long): Unit = {
    var r = 0
    while (r < depth) { buf(r * width + bucketLong(v, r, width)) += 1L; r += 1 }
  }

  def mergeInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Point estimate = min over depth rows. */
  def estimateLong(buf: Array[Long], depth: Int, width: Int, v: Long): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = buf(r * width + bucketLong(v, r, width))
      if (c < est) est = c
      r += 1
    }
    est
  }
}

/** Count-Min frequency sketch: `depth × width` counters; the aggregate
  * evaluates the point estimate for `queryValue` (min over rows).
  * The sketch itself (the buffer) is what merges across partitions —
  * one estimate per group costs depth·width longs on the wire
  * regardless of input cardinality.
  */
case class CmsAggregate(
    child: Expression,
    queryValue: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16 && width >= 16,
    "depth in [1,16], width >= 16")

  // queryValue must be a constant (it is evaluated against the empty
  // row at sketch-eval time). Enforced at analysis, when children are
  // resolved — at construction the Column may still be an unresolved
  // literal node.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!queryValue.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cms query value must be a foldable (constant) expression, " +
          s"got: ${queryValue.sql}")
    else if (!DataType.equalsIgnoreNullability(queryValue.dataType, child.dataType))
      // the sketch hashes values AS the child's type; a query constant
      // of another type (e.g. INT 7 probing a BIGINT column) would hash
      // differently and silently return 0
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cms query value type ${queryValue.dataType.sql} must match " +
          s"the sketched column type ${child.dataType.sql} — cast the constant")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, queryValue)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = CmsSketch.empty(depth, width)

  private def bucket(v: Any, row: Int): Int = {
    val h = XxHash64Function.hash(v, child.dataType, 1000003L * (row + 1))
    ((h % width + width) % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var r = 0
      while (r < depth) { buf(r * width + bucket(v, r)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CmsSketch.mergeInto(a, b)

  override def eval(buf: Array[Long]): Any = {
    val q = queryValue.eval(InternalRow.empty)
    if (q == null) 0L
    else {
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = buf(r * width + bucket(q, r))
        if (c < est) est = c
        r += 1
      }
      est
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAggregate =
    copy(child = newChildren.head, queryValue = newChildren(1))
  override def prettyName: String = "graft_cms"
}

/** The Misra-Gries counter algebra, shared by the batch aggregate and
  * the streaming mapGroupsWithState maintainer. Counts are
  * java.lang.Long so absent-key lookups stay null-safe.
  */
object MisraGries {
  type Buf = java.util.HashMap[String, java.lang.Long]

  def empty(capacity: Int): Buf = new java.util.HashMap(capacity * 2)

  /** Fold one key in: increment if resident or under capacity, else
    * the classic decrement-all-and-evict-zeros step.
    */
  def update(buf: Buf, capacity: Int, k: String): Unit = {
    val cur = buf.get(k)
    if (cur != null || buf.size < capacity) {
      buf.put(k, (if (cur == null) 0L else cur.longValue()) + 1L)
    } else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Counter-wise sum of `b` into `a`, then uniform subtraction of the
    * (capacity+1)-th largest count — ties at the threshold all drop to
    * ≤ 0, so the surviving set is independent of map iteration order.
    */
  def mergeInto(a: Buf, b: Buf, capacity: Int): Buf = {
    val bit = b.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, (if (cur == null) 0L else cur.longValue()) + e.getValue)
    }
    if (a.size > capacity) {
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(a.size - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= threshold) it.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
    a
  }
}

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", 2012): at most
  * `capacity` counters survive; the map-side partials and the shuffle
  * carry ≤ capacity (key, count) pairs per group regardless of input
  * cardinality. Returns the summary as MAP<STRING, BIGINT>.
  *
  * Guarantees (any arrival/merge order, n = total non-null rows,
  * k = capacity): for EVERY key, exact − n/(k+1) ≤ est ≤ exact with
  * est = 0 for absent keys — so any key with exact > n/(k+1) is
  * present. The SURVIVING SET for keys below that threshold is
  * order-dependent (like any MG sketch); queries must assert the
  * bound, not the set.
  */
case class TopKAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(capacity >= 1 && capacity <= 65536, "capacity in [1, 65536]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk sketches STRING columns, got ${child.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    MisraGries.empty(capacity)

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) MisraGries.update(buf, capacity, v.toString)
    buf
  }

  override def merge(a: java.util.HashMap[String, java.lang.Long],
      b: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] =
    MisraGries.mergeInto(a, b, capacity)

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey)
      vals(i) = e.getValue.longValue()
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_topk"
}

/** All S AMS sign contributions (±1) of one key in a single compiled
  * pass — the explode-free shape for sketch_ams_f2. The exploded plan
  * materializes one row per (row, counter): 64× the input volume
  * (3.8B rows at sf1, measured 13.8 s) just to carry a ±1 into a
  * 64-key aggregate. This emits the length-S sign vector per row, so
  * the aggregate reads S longs from one projected array and the row
  * count never multiplies.
  *
  * Arithmetic is EXACTLY the oracle's degree-3 polynomial family mod
  * P=1000003 (coefficients keyed to j as in the SQL replay): identical
  * integer signs, so the estimator matches DuckDB bit-for-bit.
  */
case class AmsSigmaVecExpr(child: Expression, s: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = 1000003L
  // per-counter coefficients, hoisted once (the exploded plan
  // recomputed them per emitted row)
  @transient private lazy val a3 = Array.tabulate(s)(j => (104729L * (j + 1)) % P)
  @transient private lazy val a2 = Array.tabulate(s)(j => (7919L * (j + 3) * (j + 3)) % P)
  @transient private lazy val a1 = Array.tabulate(s)(j => (4099L * (j + 7) * (j + 7)) % P)
  @transient private lazy val a0 = Array.tabulate(s)(j => (977L * (j + 11)) % P)

  def sigmas(key: Long): Array[Long] = {
    val kk = key % P
    val out = new Array[Long](s)
    var j = 0
    while (j < s) {
      val t1 = (a3(j) * kk + a2(j)) % P
      val t2 = (t1 * kk + a1(j)) % P
      val t3 = (t2 * kk + a0(j)) % P
      out(j) = 1L - 2L * (t3 % 2L)
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sigmas(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("amsSigmaExpr", this, classOf[AmsSigmaVecExpr].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $expr.sigmas($c));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AmsSigmaVecExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_ams_sigmas"
}

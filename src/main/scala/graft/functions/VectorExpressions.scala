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
  * row machinery, WITH canonical-table emission so no downstream
  * distinct is needed.
  *
  * Inputs per PROBE row: float vector, precomputed L2 norm, id, the
  * probe's ALL-TABLES bucket-code array, the current table index, and
  * the bucket's packed pool — array<struct<id bigint, vf array<float>,
  * nrm double, codes array<bigint>, poolmask bigint>> (≤ bucketCap
  * members; `poolmask` bit t' = member is inside table t''s capped
  * pool for its bucket there). Output: array<struct<id_a bigint,
  * cos double>> of members with id < probe id, cosine ≥
  * `rawThreshold`, AND no EARLIER table t' < t where the pair also
  * collides with the member pooled — that earlier (tbl, bucket) task
  * already emitted the pair, so each unordered pair is emitted
  * EXACTLY ONCE across the whole fan-out and the result needs no
  * distinct. The emitted SET is identical to the distinct of the
  * naive all-tables pool join (a pair survives that iff SOME shared
  * table pools its lower id; canonical emission picks the first such
  * table) — LshRecallSpec asserts the equivalence on a random corpus.
  *
  * Why packed: scoring candidates in the (tbl, bucket) equi-join
  * looks in-task, but every pool×probe match still materializes a
  * ~600 B joined row BEFORE the cosine filter — at the r10 sf100
  * probe that was 3.2G candidate rows ≈ 1.9 TB of memory churn for
  * ~200 GFLOP of math. Packing the pool ONE ROW PER BUCKET makes the
  * join 1:1 (each probe row meets exactly one packed row, read by
  * reference), members score in a widened-float loop (identical IEEE
  * sequence to the double dot — exact for float-origin corpora), and
  * only emitted pairs become rows.
  *
  * `rawThreshold` is a CONSERVATIVE pre-filter: callers that publish
  * `round(cos, 4) ≥ t` pass `t − 1e-4` here (4-dp rounding moves a
  * value by ≤ 5e-5, so no survivor is lost) and apply the exact
  * rounded filter on the exploded survivors.
  */
case class LshPoolMatchesExpr(vec: Expression, nrm: Expression,
    id: Expression, codes: Expression, tbl: Expression, pool: Expression,
    rawThreshold: Double)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, nrm, id, codes, tbl, pool)

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val cOk = codes.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val pOk = pool.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 5 =>
        fs(0).dataType == LongType && fs(2).dataType == DoubleType &&
          fs(4).dataType == LongType &&
          (fs(1).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) &&
          (fs(3).dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vOk && nrm.dataType == DoubleType && id.dataType == LongType &&
        cOk && tbl.dataType == IntegerType && pOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, double, bigint, array<bigint>, " +
        s"int, array<struct<id bigint, vf array<float>, nrm double, " +
        s"codes array<bigint>, poolmask bigint>>), got " +
        s"(${vec.dataType.catalogString}, ${nrm.dataType.catalogString}, " +
        s"${id.dataType.catalogString}, ${codes.dataType.catalogString}, " +
        s"${tbl.dataType.catalogString}, ${pool.dataType.catalogString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vAny = vec.eval(input)
    val nAny = nrm.eval(input)
    val idAny = id.eval(input)
    val cAny = codes.eval(input)
    val tAny = tbl.eval(input)
    val pAny = pool.eval(input)
    if (vAny == null || nAny == null || idAny == null || cAny == null ||
      tAny == null || pAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val nb = nAny.asInstanceOf[Double]
    val idB = idAny.asInstanceOf[Long]
    val codesB = cAny.asInstanceOf[ArrayData]
    val t = tAny.asInstanceOf[Int]
    val members = pAny.asInstanceOf[ArrayData]
    val dim = v.numElements()
    // read the probe vector once into a primitive buffer (widened) —
    // the inner loop then streams only the pool member's floats
    val vb = new Array[Double](dim)
    var d = 0
    while (d < dim) { vb(d) = v.getFloat(d).toDouble; d += 1 }
    val cb = new Array[Long](codesB.numElements())
    var ci = 0
    while (ci < cb.length) { cb(ci) = codesB.getLong(ci); ci += 1 }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val m = members.numElements()
    var i = 0
    while (i < m) {
      val row = members.getStruct(i, 5)
      val idA = row.getLong(0)
      if (idA < idB) {
        // canonical-table check BEFORE the dot product: skip if an
        // earlier table already co-housed this pair with the member
        // pooled there (that task emitted it)
        val mCodes = row.getArray(3)
        val mask = row.getLong(4)
        var emitted = false
        var tp = 0
        while (tp < t && !emitted) {
          if (((mask >> tp) & 1L) == 1L && mCodes.getLong(tp) == cb(tp))
            emitted = true
          tp += 1
        }
        if (!emitted) {
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
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshPoolMatchesExpr =
    copy(vec = newChildren(0), nrm = newChildren(1), id = newChildren(2),
      codes = newChildren(3), tbl = newChildren(4), pool = newChildren(5))

  override def prettyName: String = "graft_lsh_pool_matches"
}

/** Per-bucket POOL scoring for SIMHASH near-dup candidates — the
  * [[LshPoolMatchesExpr]] shape specialized to C3: members are 24 B
  * (id, signature, poolmask) structs, the probe carries (signature,
  * id, current table), and the per-pair work is one XOR + popcount.
  * Piece-pair keys recompute from the SIGNATURE inside the loop (the
  * 5-piece Manku layout is a pure bit function of the sighash — no
  * codes array needs to ride the shuffle, unlike the hyperplane LSH
  * case where codes are dot-product signs of the full vector).
  *
  * Canonical-table emission: a pair emits at table t only if NO
  * earlier table t' < t both (a) key-collides for the pair and (b)
  * pools the member (poolmask bit t'), so each unordered pair
  * surfaces exactly once across the 10-table fan-out and the caller
  * needs no distinct. Output set == distinct of the naive pool join
  * (SimhashPackedParitySpec asserts it with a binding cap).
  *
  * Why packed (r10 sf100): the (tbl, key) equi-join materialized
  * ~10G candidate joined rows, and hot keys (statistically twinned
  * same-language docs concentrate even 26-bit keys: max df 431k at
  * sf100) serialize into single SMJ key-group tasks — measured 157 s
  * at sf100 for what is ~10G cheap popcounts. Packed, a hot key is
  * ONE 6 KB row and its probes stream map-side.
  *
  * Emits pairs with hamming ≤ `maxHamming` as
  * array<struct<id_a bigint, hamming bigint>>.
  */
case class SimhashPoolMatchesExpr(sig: Expression, id: Expression,
    tbl: Expression, pool: Expression, maxHamming: Int)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def first: Expression = sig
  override def second: Expression = id
  override def third: Expression = tbl
  override def fourth: Expression = pool

  override def checkInputDataTypes(): TypeCheckResult = {
    val pOk = pool.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && fs(1).dataType == LongType &&
          fs(2).dataType == LongType
      case _ => false
    }
    if (sig.dataType == LongType && id.dataType == LongType &&
        tbl.dataType == IntegerType && pOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint, int, array<struct<id bigint, " +
        s"sig bigint, poolmask bigint>>), got (${sig.dataType.catalogString}, " +
        s"${id.dataType.catalogString}, ${tbl.dataType.catalogString}, " +
        s"${pool.dataType.catalogString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("hamming", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean =
    sig.nullable || id.nullable || tbl.nullable || pool.nullable

  /** The C3 piece-PAIR key of signature `s` in table `t` — must stay
    * bit-identical to the SQL layout in DedupQueries.dedupSimhashSql:
    * 5 pieces (4×13 + 1×12 bits at offsets 0,13,26,39,52), table
    * p*5+q keyed by piece(p)·8192 + piece(q).
    */
  def tableKey(s: Long, t: Int): Long = {
    // inverse of the (p, q) -> p*5+q table numbering for p < q < 5
    val p = if (t <= 4) 0 else if (t <= 9) 1 else if (t <= 14) 2 else 3
    val q = t - p * 5
    def piece(i: Int): Long =
      if (i < 4) (s >>> (13 * i)) & 8191L else (s >>> 52) & 4095L
    piece(p) * 8192L + piece(q)
  }

  override protected def nullSafeEval(sAny: Any, idAny: Any, tAny: Any,
      pAny: Any): Any = {
    val shB = sAny.asInstanceOf[Long]
    val idB = idAny.asInstanceOf[Long]
    val t = tAny.asInstanceOf[Int]
    val members = pAny.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val m = members.numElements()
    var i = 0
    while (i < m) {
      val row = members.getStruct(i, 3)
      val idA = row.getLong(0)
      if (idA < idB) {
        val shA = row.getLong(1)
        val mask = row.getLong(2)
        var emitted = false
        var tp = 0
        while (tp < t && !emitted) {
          if (((mask >> tp) & 1L) == 1L && tableKey(shA, tp) == tableKey(shB, tp))
            emitted = true
          tp += 1
        }
        if (!emitted) {
          val ham = java.lang.Long.bitCount(shA ^ shB)
          if (ham <= maxHamming)
            out += org.apache.spark.sql.catalyst.InternalRow(idA, ham.toLong)
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SimhashPoolMatchesExpr =
    copy(sig = newFirst, id = newSecond, tbl = newThird, pool = newFourth)

  override def prettyName: String = "graft_simhash_pool_matches"
}

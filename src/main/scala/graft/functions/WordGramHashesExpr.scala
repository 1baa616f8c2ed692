package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 64-bit hashes of a text's word `k`-grams, computed
  * in ONE compiled pass over the bytes.
  *
  * Equivalent (up to the 64-bit identity) to the HOF chain
  * `array_sort(array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', slice(tokens, i, k)))))` over
  * `filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')` — the
  * shape the r8 sf1 probe measured at 45.9 s of dedup_prefix_filter's
  * 55 s (interpreted lambda + ~9M string slice/concat allocations).
  * Tokens are maximal runs of [a-z0-9] after ASCII lowercasing (the
  * same stream the regex yields on this corpus); each window of k
  * tokens hashes FNV-1a-64 over its bytes with single-space
  * separators, so equal gram strings get equal codes and distinct
  * grams collide with probability ~1/2⁶⁴ (an intersection/count built
  * on the codes equals the string-set one w.h.p.; the brute-force
  * string oracle remains the end-to-end proof).
  *
  * Codegen emits one static call per row — the loop itself is
  * compiled Scala, not interpreted expression trees.
  */
case class WordGramHashesExpr(child: Expression, k: Int,
    distinct: Boolean = true) extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashesExpr.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramHashesExpr.compute($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_word_gram_hashes"
}

/** The corpus shingle hash `p` of every word `k`-gram, computed with
  * EXACTLY the arithmetic the queries (and their DuckDB oracles)
  * define: tokens joined by single spaces, then
  * `p = fold(chars, 7, (acc, c) -> (acc·31 + c) mod 1 000 000 007)`.
  * This is a SEMANTIC hash — minhash permutations and DSIR buckets
  * are functions of these exact values — so unlike
  * [[WordGramHashesExpr]] it cannot be swapped for a faster family;
  * what this expression removes is the interpreted cost of producing
  * it (an exploded shingle STRING per window plus a per-character
  * aggregate lambda — two allocations and ~60 interpreted steps per
  * window, the bulk of the minhash family's sf1 time).
  *
  * Window rule matches `sequence(0, greatest(ntok - k, 0))`: documents
  * with fewer than k tokens still emit ONE (short) window over all
  * their tokens. `distinct` dedups by p — downstream consumers
  * (per-permutation MIN, distinct (doc, p) sets) are invariant to
  * which of two p-colliding shingle strings survives.
  */
case class WordShingleModHashesExpr(child: Expression, k: Int,
    distinct: Boolean = true) extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingleModHashesExpr.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingleModHashesExpr.compute($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleModHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingle_mod_hashes"
}

object WordShingleModHashesExpr {

  private final val Mod = 1000000007L

  def compute(text: UTF8String, k: Int, distinct: Boolean): GenericArrayData = {
    val bytes = text.getBytes.clone()
    val n = bytes.length
    // primitive int buffers (r10): the boxed ArrayList[Integer] pair
    // this replaces allocated ~2 boxed ints per token — ~7G boxed
    // allocations across a 5M-doc sf100 signature pass, pure GC churn
    var starts = new Array[Int](math.max(16, n / 8))
    var ends = new Array[Int](starts.length)
    var ntok = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val b = bytes(i)
      val lower: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok && !inTok) {
        if (ntok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, ntok * 2)
          ends = java.util.Arrays.copyOf(ends, ntok * 2)
        }
        starts(ntok) = i; inTok = true
      }
      if (!isTok && inTok) { ends(ntok) = i; ntok += 1; inTok = false }
      bytes(i) = lower
      i += 1
    }
    if (inTok) { ends(ntok) = n; ntok += 1 }
    // no tokens ⇒ no shingles (a plain token explode emits no rows;
    // the corpus has no all-separator docs, so the minhash consumers
    // see no difference either)
    if (ntok == 0) return new GenericArrayData(Array.empty[Long])
    // sequence(0, greatest(ntok - k, 0)) ⇒ max(ntok - k, 0) + 1 windows
    val m = math.max(ntok - k, 0) + 1
    val hashes = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = 7L
      var t = g
      val tEnd = math.min(g + k, ntok)
      while (t < tEnd) {
        if (t > g) h = (h * 31L + ' '.toLong) % Mod
        var p = starts(t)
        val e = ends(t)
        while (p < e) {
          h = (h * 31L + (bytes(p) & 0xffL)) % Mod
          p += 1
        }
        t += 1
      }
      hashes(g) = h
      g += 1
    }
    if (!distinct) return new GenericArrayData(hashes)
    java.util.Arrays.sort(hashes)
    var w = 1
    i = 1
    while (i < m) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

/** The complete 64-bit SimHash signature of a document in ONE compiled
  * pass — exactly the computation the C3 oracle replays: per token
  * `h = (poly(31, 1e9+7, 7) << 31) + poly(37, 998244353, 11)` over the
  * token's lowercased chars, then 64 ±1 bit counters over all tokens,
  * then `Σ (counter_i > 0) << i`. Per-doc signatures are row-local
  * math, so expressing them as an exploded token frame + 64 sum
  * columns (the previous shape) paid a 12M-row shuffle for work that
  * never needed to leave the row; this runs at scan speed and keeps
  * every integer op identical, so the oracle replays unchanged.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimhashExpr {

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes.clone()
    val n = bytes.length
    val counters = new Array[Int](64)
    var i = 0
    var tokStart = -1
    def flush(start: Int, end: Int): Unit = {
      var h31 = 7L
      var h37 = 11L
      var p = start
      while (p < end) {
        val c = bytes(p) & 0xffL
        h31 = (h31 * 31L + c) % 1000000007L
        h37 = (h37 * 37L + c) % 998244353L
        p += 1
      }
      val h = (h31 << 31) + h37
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
    }
    while (i < n) {
      val b = bytes(i)
      val lower: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      bytes(i) = lower
      if (isTok && tokStart < 0) tokStart = i
      if (!isTok && tokStart >= 0) { flush(tokStart, i); tokStart = -1 }
      i += 1
    }
    if (tokStart >= 0) flush(tokStart, n)
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object WordGramHashesExpr {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** One pass: lowercase bytes, token spans, rolling k-window FNV-1a
    * hash with ' ' separators, then (when `distinct`) sort + dedup the
    * codes; positional mode keeps one code per window in text order.
    */
  def compute(text: UTF8String, k: Int, distinct: Boolean = true): GenericArrayData = {
    // getBytes may expose UTF8String's internal buffer — clone before
    // the in-place lowercasing below
    val bytes = text.getBytes.clone()
    val n = bytes.length
    // token spans over lowercased [a-z0-9] runs
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var inTok = false
    while (i < n) {
      val b = bytes(i)
      val lower: Byte =
        if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok && !inTok) { starts.add(i); inTok = true }
      if (!isTok && inTok) { ends.add(i); inTok = false }
      bytes(i) = lower
      i += 1
    }
    if (inTok) ends.add(n)
    val ntok = starts.size()
    if (ntok < k) return new GenericArrayData(Array.empty[Long])
    val m = ntok - k + 1
    val hashes = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = FnvOffset
      var t = g
      while (t < g + k) {
        if (t > g) { h ^= ' '.toLong; h *= FnvPrime }
        var p = starts.get(t).intValue()
        val e = ends.get(t).intValue()
        while (p < e) {
          h ^= (bytes(p) & 0xffL)
          h *= FnvPrime
          p += 1
        }
        t += 1
      }
      hashes(g) = h
      g += 1
    }
    if (!distinct) return new GenericArrayData(hashes)
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted codes
    var w = 1
    i = 1
    while (i < m) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

/** Per-document repetition statistics in ONE compiled pass:
  * `[n_toks, n_distinct, top_unigram_count, top_bigram_count]` over
  * the same lowercased `[a-z0-9]` token stream as [[SimhashExpr]] /
  * [[WordGramHashesExpr]].
  *
  * Replaces text_repetition's exploded `groupBy(doc_id, tok)` /
  * `groupBy(doc_id, bigram)` aggregations — per-document mode counts
  * are ROW-LOCAL, and at scale the exploded shape shuffles
  * O(total tokens) rows (640M at the r9 sf100 probe, 16.1× wall for
  * 10× data once the hash agg started spilling) for work a single
  * pass computes in place. Token identity is the 64-bit FNV-1a code
  * (distinct tokens collide w.p. ~1/2⁶⁴ — the same contract as
  * [[WordGramHashesExpr]]); counts come from sorted code runs, so the
  * only allocation is the per-row code array.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_repetition_stats"
}

object RepetitionStatsExpr {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Sorted-run distinct count + max run length. Mutates `a`. */
  private def runStats(a: Array[Long]): (Long, Long) = {
    if (a.length == 0) return (0L, 0L)
    java.util.Arrays.sort(a)
    var distinct = 1L
    var best = 1L
    var run = 1L
    var i = 1
    while (i < a.length) {
      if (a(i) == a(i - 1)) { run += 1; if (run > best) best = run }
      else { distinct += 1; run = 1 }
      i += 1
    }
    (distinct, best)
  }

  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes.clone()
    val n = bytes.length
    // token spans over lowercased [a-z0-9] runs (the SimhashExpr walk)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var inTok = false
    while (i < n) {
      val b = bytes(i)
      val lower: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok && !inTok) { starts.add(i); inTok = true }
      if (!isTok && inTok) { ends.add(i); inTok = false }
      bytes(i) = lower
      i += 1
    }
    if (inTok) ends.add(n)
    val ntok = starts.size()
    val uni = new Array[Long](ntok)
    var t = 0
    while (t < ntok) {
      var h = FnvOffset
      var p = starts.get(t).intValue()
      val e = ends.get(t).intValue()
      while (p < e) { h ^= (bytes(p) & 0xffL); h *= FnvPrime; p += 1 }
      uni(t) = h
      t += 1
    }
    // bigram code = FNV continued across "tok_i ' ' tok_{i+1}" — the
    // same separator convention as WordGramHashesExpr's k-windows
    val bi = new Array[Long](math.max(ntok - 1, 0))
    t = 0
    while (t < ntok - 1) {
      var h = FnvOffset
      var p = starts.get(t).intValue()
      var e = ends.get(t).intValue()
      while (p < e) { h ^= (bytes(p) & 0xffL); h *= FnvPrime; p += 1 }
      h ^= ' '.toLong; h *= FnvPrime
      p = starts.get(t + 1).intValue()
      e = ends.get(t + 1).intValue()
      while (p < e) { h ^= (bytes(p) & 0xffL); h *= FnvPrime; p += 1 }
      bi(t) = h
      t += 1
    }
    val (nDistinct, topUni) = runStats(uni)
    val (_, topBi) = runStats(bi)
    new GenericArrayData(Array(ntok.toLong, nDistinct, topUni, topBi))
  }
}

/** Row-local hashed bag-of-words features for E15 (text_hash_features):
  * one pass over the text replaces the explode → groupBy(doc_id,
  * bucket) → groupBy(doc_id) shape whose 750M exploded token rows
  * spilled through two shuffle levels at sf100 (15.4x wall for 10x
  * docs). Tokens are lowercased [a-z0-9] byte runs and the bucket is
  * the ORACLE'S OWN integer fold — ((acc·31 + c) mod 1e9+7) mod 64
  * with acc seeded 7 — so results are bit-identical to the SQL twin
  * on ASCII corpora (the gram expressions' standing precondition:
  * SQL `lower`/`ascii` and the byte walk agree only on ASCII).
  *
  * Returns array<long>: [nnz, n_tokens, top_bucket, top_count,
  * sum(c²)]; callers derive l2 = round(sqrt(sum c²), 4) in SQL so the
  * IEEE rounding matches the oracle, and drop n_tokens == 0 docs (the
  * explode shape never emitted them).
  */
case class HashFeaturesExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HashFeaturesExpr.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashFeaturesExpr.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): HashFeaturesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_hash_features"
}

object HashFeaturesExpr {

  private final val Mod = 1000000007L

  def compute(text: UTF8String, buckets: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new Array[Long](buckets)
    var h = 7L
    var inTok = false
    var i = 0
    while (i <= n) {
      val b: Byte = if (i < n) bytes(i) else ' '.toByte
      val lower: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        if (!inTok) { h = 7L; inTok = true }
        h = (h * 31L + (lower & 0xffL)) % Mod
      } else if (inTok) {
        counts((h % buckets).toInt) += 1L
        inTok = false
      }
      i += 1
    }
    var nnz = 0L
    var nTokens = 0L
    var topBucket = 0L
    var topCount = 0L
    var sumSq = 0L
    var bkt = 0
    while (bkt < buckets) {
      val c = counts(bkt)
      if (c > 0L) {
        nnz += 1L
        nTokens += c
        sumSq += c * c
        if (c > topCount) { topCount = c; topBucket = bkt.toLong }
      }
      bkt += 1
    }
    new GenericArrayData(Array(nnz, nTokens, topBucket, topCount, sumSq))
  }
}

/** 64-slot hashed token-bucket histogram for J17 — same tokenization
  * and ((acc·31 + c) mod 1e9+7) mod `buckets` fold as
  * [[HashFeaturesExpr]] (ASCII-corpus precondition likewise), but
  * returns the raw counts array so callers can take EXACT integer
  * dot-products against per-bucket weight functions in SQL:
  * Σ_tokens w(bucket(tok)) == Σ_b counts[b]·w(b). Replaces J17's
  * explode → groupBy(doc_id) margin shuffle (750M token rows spilling
  * at sf100, 20.6x wall for 10x docs) with a scan-local pass.
  */
case class HashBucketCountsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HashBucketCountsExpr.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashBucketCountsExpr.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): HashBucketCountsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_hash_bucket_counts"
}

object HashBucketCountsExpr {

  private final val Mod = 1000000007L

  def compute(text: UTF8String, buckets: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new Array[Long](buckets)
    var h = 7L
    var inTok = false
    var i = 0
    while (i <= n) {
      val b: Byte = if (i < n) bytes(i) else ' '.toByte
      val lower: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        if (!inTok) { h = 7L; inTok = true }
        h = (h * 31L + (lower & 0xffL)) % Mod
      } else if (inTok) {
        counts((h % buckets).toInt) += 1L
        inTok = false
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Per-document MinHash SIGNATURE — the 64 per-permutation minima in
  * one compiled pass, replacing the `explode(shingles) ×
  * explode(sequence(0, 63)) → groupBy(doc_id, j).min` shape whose
  * intermediate is |docs|·|shingles|·64 rows through a hash aggregate
  * (~64 M rows at sf0.1, ~64 G at sf100 — the bulk of the minhash
  * family's time). The signature is ROW-LOCAL: same shingle stream as
  * [[WordShingleModHashesExpr]] (k-gram rolling (acc·31+c) mod 1e9+7
  * over space-joined lowercase tokens), same permutation hash
  * h_j(p) = (p·(2j+1) + (7919·j+13)) mod 1e9+7, same min — element j
  * of the result is bit-equal to the old aggregate's `m` for
  * permutation `j` (min over the multiset equals min over the
  * distinct set, so shingle dedup is immaterial).
  *
  * Returns NULL when the text has no tokens: the exploded shape
  * emitted no rows for such docs, so consumers filter nulls and see
  * the identical doc set.
  */
case class MinhashSigExpr(child: Expression, k: Int, perms: Int)
    extends UnaryExpression {

  require(k >= 1 && perms >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigExpr.compute(input.asInstanceOf[UTF8String], k, perms)

  // r11 (VERDICT r10 ask #5 / ADVICE #3): as a CodegenFallback this
  // expression ran interpreted AND broke whole-stage codegen for the
  // signature Project stage — the exact defect class r10 fixed for
  // AnySlotEqualExpr. The static helper returns null for token-less
  // docs (the exploded shape emitted no rows there), so unlike the
  // defineCodeGen siblings the generated code must re-check the
  // result for null.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigExpr.compute($c, $k, $perms);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinhashSigExpr {

  private final val Mod = 1000000007L

  /** Null when the text has no tokens (the exploded shape emits no
    * rows there); otherwise the `perms`-long signature.
    */
  def compute(text: UTF8String, k: Int, perms: Int): GenericArrayData = {
    val ps = WordShingleModHashesExpr.compute(text, k, distinct = false)
    val m = ps.numElements()
    if (m == 0) return null
    val sig = new Array[Long](perms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < m) {
      val p = ps.getLong(i)
      // incremental modular stepping (r10): h_j = (p·(2j+1) + 7919j +
      // 13) mod M satisfies h_{j+1} = h_j + (2p + 7919) (mod M), so
      // after one reduction of the step the inner loop is an add and
      // a conditional subtract — no multiply, no division. Bit-equal
      // to the closed form (pure integer congruence, no overflow:
      // h + step < 2M < 2⁶³); the direct-formula loop measured 200 s
      // for the 5M-doc sf100 signature pass, ~all of it the 64 `%`
      // reductions per shingle.
      var h = (p + 13L) % Mod
      val step = (2L * p + 7919L) % Mod
      var j = 0
      while (j < perms) {
        if (h < sig(j)) sig(j) = h
        h += step
        if (h >= Mod) h -= Mod
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

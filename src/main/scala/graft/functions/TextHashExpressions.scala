package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text fingerprint hashes.
  *
  * Replaces the nested higher-order-function formulation
  * (`transform(sequence(...), i -> aggregate(...))`), which evaluates
  * an interpreted 8-element fold PER WINDOW — O(n·w) closure calls per
  * document and the slowest query in the r2 bench (48 s at sf0.1).
  * These generate a tight O(n) Java loop inside whole-stage codegen.
  *
  * Arithmetic parity: identical modular polynomial
  * `h = (h·31 + c) mod 1000000007` over character codepoints, with
  * out-of-range positions contributing `c = 0` (the HOF/DuckDB
  * formulation reads `ascii(substring(text, k, 1))` which is 0 past
  * the end) — so results are bit-identical to the DuckDB oracle's
  * `list_reduce` replay.
  */
object TextHash {
  val Mod = 1000000007L
  val Base = 31L
  val Init = 7L

  /** Char at position i (0-based), or 0 past the end — matches
    * `ascii(substring(text, i+1, 1))` for BMP text (the UTF-16 unit
    * equals the codepoint; the corpus is ASCII).
    */
  @inline def code(s: String, i: Int, n: Int): Long =
    if (i < n) s.charAt(i).toLong else 0L
}

/** Full-text polynomial hash (the `full_fp` column). */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var h = TextHash.Init
    var i = 0
    while (i < n) {
      h = (h * TextHash.Base + TextHash.code(s, i, n)) % TextHash.Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |long $h = ${TextHash.Init}L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${TextHash.Base}L + (long) $s.charAt($i)) % ${TextHash.Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_poly_hash"
}

/** Minimum over all rolling `win`-gram polynomial hashes (the
  * winnowing-style `min_gram_fp` column). Each window hash is
  * recomputed in a fixed inner loop of length `win` — still O(n·win)
  * ARITHMETIC, but codegen'd primitive ops instead of interpreted
  * closures (win = 8 → 8 multiply-adds per window; removing the
  * interpreted dispatch is what buys the speedup). Windows start at
  * every position 1..max(n-win+1, 1); positions past the end hash as
  * zeros, matching the HOF/SQL formulation.
  */
case class MinGramHashExpr(child: Expression, win: Int) extends UnaryExpression {

  require(win >= 1 && win <= 64, "window must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val windows = math.max(n - win + 1, 1)
    var best = Long.MaxValue
    var i = 0
    while (i < windows) {
      var h = TextHash.Init
      var k = 0
      while (k < win) {
        h = (h * TextHash.Base + TextHash.code(s, i + k, n)) % TextHash.Mod
        k += 1
      }
      if (h < best) best = h
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val cc = ctx.freshName("cc")
      val best = ctx.freshName("best")
      val windows = ctx.freshName("windows")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |int $windows = java.lang.Math.max($n - $win + 1, 1);
         |long $best = Long.MAX_VALUE;
         |for (int $i = 0; $i < $windows; $i++) {
         |  long $h = ${TextHash.Init}L;
         |  for (int $k = 0; $k < $win; $k++) {
         |    long $cc = ($i + $k < $n) ? (long) $s.charAt($i + $k) : 0L;
         |    $h = ($h * ${TextHash.Base}L + $cc) % ${TextHash.Mod}L;
         |  }
         |  if ($h < $best) $best = $h;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinGramHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_min_gram_hash"
}

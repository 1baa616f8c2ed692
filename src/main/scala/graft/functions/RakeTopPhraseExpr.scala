package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document RAKE (Rose et al. 2010) in ONE compiled pass:
  * tokenize, find stopword-free runs (phrases), score words
  * deg/freq, score phrases, return the top phrase.
  *
  * Replaces E25's five-shuffle window pipeline: RAKE is entirely
  * doc-local, yet the exploded shape pushed ~750M token rows at
  * sf100 through posexplode → island window → two attach joins →
  * phrase groupBy (266 s). Here the whole extraction runs in-task
  * per row and the query becomes scan → project → sort.
  *
  * Arithmetic is kept bit-identical to the window pipeline (which
  * the DuckDB oracle replays):
  *  - tokens are maximal [a-z0-9]+ runs of the lowercased text
  *    (equivalent to split('[^a-z0-9]+') + non-empty filter; ASCII
  *    byte lowercasing — the corpus's documented precondition);
  *  - word score = round(10000·deg/freq) via BigDecimal HALF_UP
  *    (Spark's round), one IEEE division per distinct word;
  *  - phrase score = Σ of its member occurrences' integer word
  *    scores — integer sums, no float order sensitivity;
  *  - top-1 tie-break (score DESC, phrase ASC) on the raw bytes
  *    (= UTF8String binary order for ASCII).
  *
  * Returns struct(top_phrase, score_scaled, n_candidates), or null
  * when the doc has no stopword-free token run (the pipeline shape
  * emitted no row — callers filter nulls).
  */
case class RakeTopPhraseExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_phrase", StringType, nullable = false),
    StructField("score_scaled", LongType, nullable = false),
    StructField("n_candidates", LongType, nullable = false)))

  override def nullable: Boolean = true

  @transient private lazy val stopSet: Set[String] = stopwords.toSet

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // tokenize: maximal [a-z0-9]+ runs after ASCII lowercasing
    val toks = mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = text.length
    while (i < n) {
      var c = text.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) toks += sb.toString
    // islands: maximal stopword-free runs, as (start, end) tok spans
    val spans = mutable.ArrayBuffer.empty[(Int, Int)]
    var s0 = -1
    i = 0
    while (i < toks.length) {
      if (!stopSet.contains(toks(i))) { if (s0 < 0) s0 = i }
      else if (s0 >= 0) { spans += ((s0, i)); s0 = -1 }
      i += 1
    }
    if (s0 >= 0) spans += ((s0, toks.length))
    if (spans.isEmpty) return null
    // freq / deg per word over all islands
    val freq = mutable.HashMap.empty[String, Long]
    val deg = mutable.HashMap.empty[String, Long]
    for ((a, b) <- spans) {
      val plen = (b - a).toLong
      var j = a
      while (j < b) {
        val t = toks(j)
        freq.update(t, freq.getOrElse(t, 0L) + 1L)
        deg.update(t, deg.getOrElse(t, 0L) + plen)
        j += 1
      }
    }
    // integer word scores: round(10000·deg/freq), HALF_UP like
    // Spark's round() on doubles
    val wscore = mutable.HashMap.empty[String, Long]
    for ((t, f) <- freq) {
      val x = 10000.0 * deg(t) / f
      wscore(t) = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    }
    // phrase scores + top-1 (score DESC, phrase ASC)
    var bestPhrase: String = null
    var bestScore = Long.MinValue
    for ((a, b) <- spans) {
      var sc = 0L
      var j = a
      while (j < b) { sc += wscore(toks(j)); j += 1 }
      val phrase = toks.slice(a, b).mkString(" ")
      if (sc > bestScore || (sc == bestScore && phrase < bestPhrase)) {
        bestScore = sc; bestPhrase = phrase
      }
    }
    InternalRow(UTF8String.fromString(bestPhrase), bestScore,
      spans.length.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): RakeTopPhraseExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_rake_top_phrase"
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping occurrence counts of a fixed literal set in
  * `" " + lower(text) + " "`, all in ONE pass over the string.
  *
  * Replaces the `hits()` column stack in E1 (text_langid) and its
  * siblings: each `hits(padded, w)` is a full
  * `regexp_replace(padded, quote(w), "")` pass that allocates a new
  * copy of the text, so a 12-literal profile does 12 regex scans +
  * 12 allocations per row — and the final ORDER BY's range
  * partitioner re-runs the whole stack for its sampling pass. At
  * sf100 that measured 14.3x the sf10 time (GC-bound). Here the text
  * lowercases once and each literal runs an intrinsified
  * `String.indexOf` loop; left-to-right with `pos += lit.length` on
  * a match reproduces regexp_replace's non-overlapping greedy count
  * bit-exactly.
  *
  * Equivalence with the SQL oracle's
  * `(length(p) - length(replace(p, w, ''))) / len(w)` holds on ASCII
  * corpora (this corpus's documented precondition): Spark's lower()
  * and Java's toLowerCase(ROOT) agree on ASCII, while locale edges
  * like U+212A (KELVIN SIGN -> 'k') could differ. Returns
  * array<long>, one count per literal, in `literals` order.
  */
case class LiteralHitsExpr(child: Expression, literals: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(literals.nonEmpty && literals.forall(_.nonEmpty),
    "literals must be non-empty strings")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // materialized once per task deserialization, not per row
  @transient private lazy val lits: Array[String] = literals.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val padded = " " + input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT) + " "
    val out = new Array[Long](lits.length)
    var i = 0
    while (i < lits.length) {
      val w = lits(i)
      val wl = w.length
      var n = 0L
      var pos = padded.indexOf(w)
      while (pos >= 0) {
        n += 1L
        pos = padded.indexOf(w, pos + wl)
      }
      out(i) = n
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LiteralHitsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_literal_hits"
}

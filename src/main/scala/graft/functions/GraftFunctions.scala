package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for graft's native expression/aggregate
  * tier, so `spark.sql("SELECT graft_hll(x) ...")` works the same as
  * the Scala Column API. Sessions built with
  * `.withExtensions(new GraftExtensions)` get these via
  * `injectFunction`; [[register]] covers pre-built sessions.
  *
  * Aggregate builders return the raw `AggregateFunction` — the
  * analyzer wraps it in an `AggregateExpression` exactly as it does
  * for the built-in `sum`/`min` registry entries.
  */
object GraftFunctions {

  private def arity(name: String, exprs: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(exprs.length))
      throw new IllegalArgumentException(
        s"$name expects ${ns.mkString(" or ")} arguments, got ${exprs.length}")

  /** Constant-int parameters (window sizes, sketch dims) must be
    * literal ints in SQL — they shape the expression itself.
    */
  private def intLit(name: String, what: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be an integer literal, got ${e.sql}")
  }

  private def doubleLit(name: String, what: String, e: Expression): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be a numeric literal, got ${e.sql}")
  }

  /** (name, usage, builder) for every SQL-exposed graft function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      "graft_dot(a, b) - dot product of two array<double> vectors",
      exprs => { arity("graft_dot", exprs, 2)
        DotProductExpr(exprs(0), exprs(1)) }),
    ("graft_poly_hash",
      "graft_poly_hash(str) - full-text modular polynomial hash",
      exprs => { arity("graft_poly_hash", exprs, 1)
        PolyHashExpr(exprs(0)) }),
    ("graft_min_gram_hash",
      "graft_min_gram_hash(str, win) - minimum win-gram polynomial hash (winnowing fingerprint)",
      exprs => { arity("graft_min_gram_hash", exprs, 2)
        MinGramHashExpr(exprs(0), intLit("graft_min_gram_hash", "win", exprs(1))) }),
    ("graft_gram_codes",
      "graft_gram_codes(str, win) - sorted distinct injective win-gram codes",
      exprs => { arity("graft_gram_codes", exprs, 2)
        GramCodeArrayExpr(exprs(0), intLit("graft_gram_codes", "win", exprs(1))) }),
    ("graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - intersection size of two sorted array<bigint>",
      exprs => { arity("graft_sorted_intersect_count", exprs, 2)
        SortedIntersectCountExpr(exprs(0), exprs(1)) }),
    ("graft_hll",
      "graft_hll(col[, precision]) - HyperLogLog approximate distinct count",
      exprs => { arity("graft_hll", exprs, 1, 2)
        HllAggregate(exprs(0),
          if (exprs.length > 1) intLit("graft_hll", "precision", exprs(1)) else 12) }),
    ("graft_cms",
      "graft_cms(col, value[, depth, width]) - Count-Min sketch point frequency estimate",
      exprs => { arity("graft_cms", exprs, 2, 4)
        val (depth, width) =
          if (exprs.length == 4)
            (intLit("graft_cms", "depth", exprs(2)), intLit("graft_cms", "width", exprs(3)))
          else (5, 2048)
        CmsAggregate(exprs(0), exprs(1), depth, width) }),
    ("graft_bloom",
      "graft_bloom(col[, numBits, numHashes]) - Bloom filter over a column, as BINARY",
      exprs => { arity("graft_bloom", exprs, 1, 3)
        val (bits, k) =
          if (exprs.length == 3)
            (intLit("graft_bloom", "numBits", exprs(1)),
              intLit("graft_bloom", "numHashes", exprs(2)))
          else (1 << 17, 7)
        BloomAggregate(exprs(0), bits, k) }),
    ("graft_bloom_contains",
      "graft_bloom_contains(filter, value) - membership probe against a graft_bloom BINARY",
      exprs => { arity("graft_bloom_contains", exprs, 2)
        BloomContainsExpr(exprs(0), exprs(1)) }),
    ("graft_topk",
      "graft_topk(col, capacity) - Misra-Gries heavy-hitters summary as MAP<STRING,BIGINT>",
      exprs => { arity("graft_topk", exprs, 2)
        TopKAggregate(exprs(0), intLit("graft_topk", "capacity", exprs(1))) }),
    ("graft_kll",
      "graft_kll(col, q[, k]) - KLL sketch approximate q-quantile of a double column",
      exprs => { arity("graft_kll", exprs, 2, 3)
        KllAggregate(exprs(0), doubleLit("graft_kll", "q", exprs(1)),
          if (exprs.length > 2) intLit("graft_kll", "k", exprs(2)) else 400) }))

  /** Register every graft function on an already-built session;
    * idempotent (re-registration overwrites with the same builder).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      GraftBridge.registerFunction(spark, name, usage, builder)
    }
}

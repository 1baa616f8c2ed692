package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector helpers over `array<double>` columns. The dot product is a
  * native codegen'd Catalyst expression (see
  * [[graft.functions.DotProductExpr]]) — a sequential left fold, so
  * results are bit-identical to DuckDB's list_dot_product on the same
  * inputs.
  */
object VectorOps {

  /** Dot product of two array<double> columns (native expression). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.DotProductExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column data layout.
  *
  * Range-partitioning + sorting a table by the interleaved bits of
  * two (or more) bucketed key columns makes EVERY interleaved column
  * cluster within files and row groups, so min/max stats prune scans
  * filtered on ANY of them — the standard multi-dimensional layout
  * move for 100 TB tables (one sorted layout can serve one column's
  * pruning; a Z-order layout serves all interleaved columns at once,
  * trading each for slightly coarser clustering).
  *
  * Built from plain shift/mask expressions — codegen'd, no UDF.
  */
object ZOrder {

  /** Clamp a non-negative long column into [0, 2^bits). */
  private def clamp(c: Column, bits: Int): Column =
    least(greatest(c, lit(0L)), lit((1L << bits) - 1))

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    */
  def morton(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val ca = clamp(a, bits)
    val cb = clamp(b, bits)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Map a numeric column onto [0, 2^bits) by linear scaling between
    * `lo` and `hi` (values outside clamp to the ends) — the bucketing
    * step before interleaving a continuous column.
    */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, "hi must exceed lo")
    val n = (1L << bits) - 1
    floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble))
      .cast("long")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total over a total order — the scale-safe
  * replacement for `sum(x).over(Window.orderBy(...))`, which (like
  * global ntile) drags the whole table through ONE partition.
  *
  * Same two-phase shape as [[DistributedNtile]]:
  *   1. `repartitionByRange` on the sort keys + `sortWithinPartitions`
  *      + `monotonically_increasing_id()` (globally ordered like the
  *      sort); the within-partition running sum is a window
  *      PARTITIONED by the physical partition id — every partition
  *      computes its prefix sums in parallel.
  *   2. Per-partition value totals (tiny: one row per shuffle
  *      partition) turned into cumulative offsets with a triangular
  *      self-join and broadcast back; global running total =
  *      partition offset + local running sum.
  *
  * The caller must pass a TOTAL order (include a tiebreaker).
  */
object DistributedPrefixSum {

  /** Adds `outCol` = running total of `value` under `sort`. */
  def withRunningTotal(df: DataFrame, value: Column, outCol: String,
      sort: Column*): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins ONE materialization of the stamped layout.
    // Without it the offsets subquery (broadcast job) and the main
    // join would evaluate `stamped` as two independent jobs — and
    // repartitionByRange's boundary SAMPLE depends on upstream row
    // order, which a shuffle/hash-agg parent does not make
    // deterministic across jobs: the two evaluations can disagree on
    // partition boundaries, making every global rank silently wrong.
    val stamped = df
      .repartitionByRange(parts, sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__v", value)
      .localCheckpoint(eager = true)
    val wIn = Window.partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = stamped.groupBy(col("__pid")).agg(sum(col("__v")).as("__s"))
    val offsets = sums.as("a")
      .join(sums.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__s")), lit(0L)).as("__voff"))
    stamped
      .withColumn("__run", sum(col("__v")).over(wIn))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__run") + col("__voff"))
      .drop("__mid", "__pid", "__v", "__run", "__voff")
  }
}

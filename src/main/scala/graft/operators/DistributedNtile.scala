package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact ntile over a total order — the scale-safe
  * replacement for `ntile(n).over(Window.orderBy(...))`, which moves
  * the ENTIRE table through a single partition (Spark warns "No
  * Partition Defined for Window operation").
  *
  * Two-phase plan (no single-partition stage anywhere):
  *   1. `repartitionByRange` on the sort keys (one shuffle; the range
  *      exchange's sampling pass gives ordered partitions) +
  *      `sortWithinPartitions` (no extra exchange), then stamp
  *      `monotonically_increasing_id()` — its (partitionId << 33 | idx)
  *      layout means the id is globally ordered exactly like the sort.
  *   2. Per-partition row counts (a tiny aggregate, map-side combined:
  *      ≤ one row per shuffle partition), turned into cumulative
  *      offsets with a triangular self-join over that tiny frame (no
  *      window — windows over an unpartitioned ORDER BY are exactly
  *      the anti-pattern this operator removes), broadcast back, and
  *      the exact global rank = offset + local idx + 1.
  *
  * Bucket assignment reproduces SQL ntile semantics precisely: with n
  * rows and `buckets` buckets, the first (n mod buckets) buckets get
  * ceil(n/buckets) rows, the rest floor(n/buckets).
  *
  * The caller must pass a TOTAL order (include a tiebreaker column);
  * rows with equal sort keys land in one range partition, but their
  * relative rank — like ntile's — would be nondeterministic.
  */
object DistributedNtile {

  /** Adds `bucketCol` (1-based long) to `df`, bucketing rows by their
    * exact rank under `sort`. Internal helper columns are dropped.
    */
  def withNtile(df: DataFrame, buckets: Int, bucketCol: String, sort: Column*): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // localCheckpoint pins ONE materialization of the stamped layout:
    // the counts/offsets/total subqueries and the final projection
    // otherwise evaluate `stamped` as separate jobs, and
    // repartitionByRange's boundary sample depends on upstream row
    // order — not deterministic across jobs below a shuffle/hash-agg
    // parent — so the two evaluations could disagree on partition
    // boundaries and corrupt every global rank.
    val stamped = df
      .repartitionByRange(parts, sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__idx", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint(eager = true)

    // Tiny frame: one row per partition. Cumulative offsets + grand
    // total via a triangular self-join (≤ parts² rows — trivial).
    val counts = stamped.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    val total = counts.agg(sum(col("__cnt")).as("__n"))

    val r = col("__off") + col("__idx") + lit(1L) // exact global rank
    val q = col("__n").divide(buckets).cast("long") // floor(n / buckets)
    val rem = col("__n") % buckets
    val bigSpan = rem * (q + 1) // rows covered by the ceil-sized buckets
    val bucket = when(r <= bigSpan, (r - 1).divide(q + 1).cast("long") + 1)
      .otherwise(rem + (r - bigSpan - 1).divide(greatest(q, lit(1L))).cast("long") + 1)

    stamped
      .join(broadcast(offsets), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn(bucketCol, bucket)
      .drop("__mid", "__pid", "__idx", "__off", "__n")
  }
}

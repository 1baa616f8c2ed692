package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.operators.DistributedNtile

/** DistributedNtile: exact parity with SQL ntile semantics and a
  * physical plan with NO window operator (the whole point — the
  * single-partition `Window.orderBy` ntile is the scale-killer this
  * operator replaces).
  */
class NtileSpec extends SparkSpec {

  private def orders = Tables.load(spark, sfDir, "orders")

  test("matches windowed ntile exactly for several bucket counts") {
    for (b <- Seq(1, 3, 4, 7, 32)) {
      val dist = DistributedNtile
        .withNtile(orders, b, "nt", col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("nt"))
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val ref = orders
        .withColumn("nt", ntile(b).over(w).cast("long"))
        .select(col("o_orderkey"), col("nt"))
      assert(dist.except(ref).isEmpty && ref.except(dist).isEmpty,
        s"ntile($b) mismatch vs windowed reference")
    }
  }

  test("handles n < buckets (every row its own bucket, no div-by-zero)") {
    val tiny = orders.limit(3)
    val dist = DistributedNtile
      .withNtile(tiny, 10, "nt", col("o_totalprice").desc, col("o_orderkey"))
    val buckets = dist.select("nt").collect().map(_.getLong(0)).sorted
    assert(buckets.sameElements(Array(1L, 2L, 3L)))
  }

  test("q26_ntile physical plan contains no WindowExec") {
    val df = RelationalQueries.queries("q26_ntile")(spark, sfDir)
    val windows = df.queryExecution.executedPlan.collectWithSubqueries {
      case w: WindowExec => w
    }
    assert(windows.isEmpty,
      s"q26 must not plan a window operator:\n${df.queryExecution.executedPlan.toString.take(1500)}")
    assert(df.count() == 4)
  }

  test("prefix sums stay exact below a hash-agg parent (regression)") {
    // Regression for a real corruption: `stamped`'s offsets subquery
    // and final join run as SEPARATE jobs, and repartitionByRange's
    // boundary sample depends on upstream row order — which a
    // shuffle + hash-agg parent does NOT make deterministic across
    // jobs (shuffle fetch arrival order varies). Before the eager
    // localCheckpoint pin, this exact shape (groupBy upstream, ~40k
    // distinct keys) produced 34,992 wrong ranks of 39,991 at
    // sf0.01. The oracle is a driver-side scan of one materialized
    // dump, so it cannot itself be re-planned.
    val byVal = Tables.load(spark, sfDir, "lineitem")
      .select((round(col("l_extendedprice") * 100, 0)).cast("long").as("cents"))
      .groupBy(col("cents")).agg(count(lit(1)).as("t"))
    val cum = graft.operators.DistributedPrefixSum
      .withRunningTotal(byVal, col("t"), "cum", col("cents"))
      .select(col("cents"), col("t"), col("cum"))
      .collect().sortBy(_.getLong(0))
    var running = 0L
    cum.foreach { r =>
      running += r.getLong(1)
      assert(r.getLong(2) == running,
        s"cents=${r.getLong(0)}: cum=${r.getLong(2)} want=$running")
    }
  }

  test("the data path stays multi-partition, never one partition") {
    // The checkpoint pin (see the regression test above) cuts lineage,
    // so the range exchange lives inside the materialized stage and no
    // longer prints in the final plan. The invariant that matters:
    // the stamped data is spread across the shuffle partitions (the
    // range exchange did its job) and the final plan has no window
    // operator and no single-partition exchange on the data path.
    val df = DistributedNtile
      .withNtile(orders, 4, "nt", col("o_totalprice").desc, col("o_orderkey"))
    assert(df.rdd.getNumPartitions > 1,
      "stamped layout must keep the range-partitioned distribution")
    val plan = df.queryExecution.executedPlan.toString
    // (a SinglePartition exchange still exists for the ≤ #partitions-
    // row counts/total aggregate — that is the tiny metadata side,
    // broadcast back, never the data)
    assert(!plan.contains("WindowExec"), s"no window operator:\n${plan.take(1500)}")
  }
}

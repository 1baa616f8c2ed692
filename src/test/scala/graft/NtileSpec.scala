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

  test("the table flows through a range exchange, not one partition") {
    val df = DistributedNtile
      .withNtile(orders, 4, "nt", col("o_totalprice").desc, col("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    // the full table is range-partitioned (distributed phase 1); the
    // only single-partition stage anywhere is the ≤ #partitions-row
    // counts aggregate, never the data path
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange on the sort keys:\n${plan.take(1500)}")
  }
}

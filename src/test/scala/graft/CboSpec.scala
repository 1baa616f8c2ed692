package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** H17's statistics feeding Spark's cost-based optimizer: ANALYZE the
  * TPC-H-ish tables, turn on CBO + join reorder, and plan-assert that
  * a 3-table join written large-table-first is REORDERED to join the
  * two small dimensions before touching the fact table. This is the
  * point of collecting stats at all — at 100 TB the difference between
  * (orders ⋈ customer) ⋈ nation and orders ⋈ (customer ⋈ nation) is a
  * full-fact-table-wide intermediate vs a dimension-sized one.
  */
class CboSpec extends SparkSpec {

  private def leafTables(p: LogicalPlan): Set[String] =
    p.collectLeaves().flatMap { l =>
      l.toString.split("\n").headOption.toSeq.flatMap(s =>
        Seq("cbo_orders", "cbo_customer", "cbo_nation").filter(s.contains))
    }.toSet

  /** The deepest (first-executed) Join in the optimized plan. */
  private def deepestJoin(p: LogicalPlan): Join =
    p.collect { case j: Join => j }.last

  test("ANALYZE column stats drive a cost-based 3-table join reorder") {
    val tables = Seq("orders" -> "cbo_orders", "customer" -> "cbo_customer",
      "nation" -> "cbo_nation")
    tables.foreach { case (src, name) =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // external parquet tables over the shared store — no data copy;
      // ANALYZE records rowCount/NDV into the catalog for the CBO
      spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$sfDir/$src.parquet'")
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val sql =
      """SELECT n.n_name, count(*) AS n, round(sum(o.o_totalprice), 2) AS rev
        |FROM cbo_orders o
        |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
        |JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin
    try {
      // catalog stats really landed (rowCount visible to the planner)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rc = spark.table("cbo_orders").queryExecution.optimizedPlan
        .stats.rowCount
      assert(rc.exists(_.longValue == 1500L),
        s"expected ANALYZE rowCount 1500 for cbo_orders, got $rc")

      // without reorder: joins execute in written order — the deepest
      // join touches the fact table
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val baseline = deepestJoin(spark.sql(sql).queryExecution.optimizedPlan)
      assert(leafTables(baseline) == Set("cbo_orders", "cbo_customer"),
        s"written order should join orders first, got ${leafTables(baseline)}")

      // with reorder: the two dimensions join first; the 10x-bigger
      // fact table joins the dimension-sized intermediate
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = deepestJoin(spark.sql(sql).queryExecution.optimizedPlan)
      assert(leafTables(reordered) == Set("cbo_customer", "cbo_nation"),
        s"CBO should join customer x nation first, got ${leafTables(reordered)}")

      // and the reorder preserved semantics
      val withCbo = spark.sql(sql).collect().map(_.toSeq).toSet
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val without = spark.sql(sql).collect().map(_.toSeq).toSet
      assert(withCbo == without && withCbo.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      spark.conf.unset("spark.sql.cbo.enabled")
      tables.foreach { case (_, name) => spark.sql(s"DROP TABLE IF EXISTS $name") }
    }
  }
}

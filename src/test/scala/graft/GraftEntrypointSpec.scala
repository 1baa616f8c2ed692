package graft

/** Graft.install: retrofits the full surface onto an existing session,
  * idempotently.
  */
class GraftEntrypointSpec extends SparkSpec {

  test("install registers SQL functions and is idempotent") {
    Graft.install(spark)
    Graft.install(spark) // second call must be a no-op, not an error
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
    val h = spark.sql("SELECT graft_poly_hash('abc') AS h").head().getLong(0)
    assert(h != 0L)
  }

  test("native as-of planning available after install") {
    Graft.install(spark)
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 15L, "b")).toDF("rk", "rt", "v")
    val joined = graft.plans.AsOfJoin.join(left, right, "k", "t", "rk", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    val vs = joined.orderBy("t").select("v").as[String].collect().toSeq
    assert(vs == Seq("a", "b"))
  }
}

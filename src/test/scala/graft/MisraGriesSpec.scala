package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, SketchAggregates}

/** TopKAggregate (Misra-Gries heavy hitters): exactness when capacity
  * covers the domain, the error bound and guaranteed presence of
  * truly-heavy keys on planted skew (under several partitionings),
  * and the analysis-time type guard.
  */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(SketchAggregates.topK(col("k"), cap).as("m"))
      .selectExpr("m").as[Map[String, Long]].head()

  test("capacity >= cardinality: counts are exact") {
    val df = Seq.tabulate(300)(i => s"key${i % 7}").toDF("k")
    val got = summary(df.repartition(5), 16)
    val want = df.groupBy("k").count().as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("planted skew: heavy key present within bounds, all keys bounded") {
    // 500 × "heavy" + 200 singletons, capacity 8 → threshold n/9 ≈ 77
    val rows = Seq.fill(500)("heavy") ++ (0 until 200).map(i => s"rare$i")
    val n = rows.length.toLong
    val cap = 8
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    for (parts <- Seq(1, 4, 13)) {
      val got = summary(rows.toDF("k").repartition(parts), cap)
      assert(got.size <= cap, s"summary exceeded capacity at parts=$parts")
      assert(got.contains("heavy"),
        s"heavy key (freq > n/(k+1)) evicted at parts=$parts")
      (exact.keySet ++ got.keySet).foreach { k =>
        val e = exact.getOrElse(k, 0L)
        val est = got.getOrElse(k, 0L)
        assert(est <= e && est >= e - n / (cap + 1) - 1,
          s"bound violated for $k: est=$est exact=$e at parts=$parts")
      }
    }
  }

  test("SQL surface: graft_topk callable from spark.sql") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("k").createOrReplaceTempView("graft_topk_t")
    val m = spark.sql("SELECT graft_topk(k, 4) AS m FROM graft_topk_t")
      .as[Map[String, Long]].head()
    assert(m == Map("a" -> 2L, "b" -> 1L))
  }

  test("non-string child rejected at analysis") {
    val df = Seq(1L, 2L).toDF("k")
    val ex = intercept[Exception] {
      df.agg(SketchAggregates.topK(col("k"), 4)).collect()
    }
    assert(ex.getMessage.contains("graft_topk"))
  }
}

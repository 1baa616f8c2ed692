package graft

import org.apache.spark.sql.functions._
import graft.functions.KllFunctions.kllQuantile
import graft.functions.KllOps

/** KLL quantile sketch: rank-error bounds across distributions and
  * partitionings, sketch-size sublinearity, null handling, and the
  * SQL surface.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(xs: Seq[Double], v: Double): Double =
    xs.count(_ <= v).toDouble / xs.size

  test("median rank error within 3% across distributions and partitionings") {
    val uniform = (1 to 100000).map(_.toDouble)
    val skewed = (1 to 100000).map(i => math.pow(i.toDouble, 3))
    val clumped = (1 to 100000).map(i => (i % 37).toDouble)
    for (xs <- Seq(uniform, skewed, clumped); parts <- Seq(3, 17)) {
      val est = xs.toDF("v").repartition(parts)
        .agg(kllQuantile(col("v"), 0.5)).head().getDouble(0)
      val r = rankOf(xs, est)
      assert(math.abs(r - 0.5) <= 0.03,
        s"median rank $r off by ${math.abs(r - 0.5)} (parts=$parts)")
    }
  }

  test("tail quantiles hold the same bound") {
    val xs = (1 to 50000).map(_.toDouble)
    for (q <- Seq(0.1, 0.9, 0.99)) {
      val est = xs.toDF("v").repartition(7)
        .agg(kllQuantile(col("v"), q)).head().getDouble(0)
      val r = rankOf(xs, est)
      assert(math.abs(r - q) <= 0.03, s"q=$q rank $r")
    }
  }

  test("sketch stays sublinear: serialized size grows ~log(n)") {
    def sizeAt(n: Int): Int = {
      val buf = KllOps.empty()
      (1 to n).foreach(i => KllOps.update(buf, 400, i.toDouble))
      KllOps.serialize(buf).length
    }
    val s10k = sizeAt(10000)
    val s100k = sizeAt(100000)
    assert(s100k < s10k * 3,
      s"10x input grew sketch $s10k -> $s100k (must be ~log growth)")
    assert(s100k < 64 * 1024, s"sketch must stay KB-sized, got $s100k")
  }

  test("nulls ignored; exact for tiny inputs") {
    val est = Seq(Some(1.0), None, Some(2.0), Some(3.0), None).toDF("v")
      .agg(kllQuantile(col("v"), 0.5)).head().getDouble(0)
    assert(est == 2.0, s"uncompacted sketch is exact, got $est")
  }

  test("SQL surface: graft_kll with and without explicit k") {
    graft.functions.GraftFunctions.register(spark)
    spark.range(1, 10001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kll_in")
    val r = spark.sql(
      "SELECT graft_kll(v, 0.5) AS p50, graft_kll(v, 0.9, 200) AS p90 FROM kll_in")
      .head()
    assert(math.abs(r.getDouble(0) - 5000.0) <= 300.0)
    assert(math.abs(r.getDouble(1) - 9000.0) <= 300.0)
  }

  test("non-double column fails analysis with a clear error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("v").agg(kllQuantile(col("v"), 0.5)).collect()
    }
    assert(e.getMessage.contains("DOUBLE"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchAggregates

/** Error-bound and merge behavior of the HLL / CMS
  * TypedImperativeAggregates — properties the value-equality oracle
  * can't see.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL: within 5% of exact across cardinalities, stable under repartition") {
    Seq(100L, 5000L, 100000L).foreach { n =>
      val df = spark.range(0, n).toDF("v")
      val est = df.repartition(7) // force multi-partition merge path
        .agg(SketchAggregates.hll(col("v"), precision = 12)).head().getLong(0)
      val err = math.abs(est - n).toDouble / n
      assert(err <= 0.05, s"HLL off by ${err * 100}%% at n=$n (est=$est)")
      // merge must be order/partitioning-insensitive
      val est2 = df.repartition(31)
        .agg(SketchAggregates.hll(col("v"), precision = 12)).head().getLong(0)
      assert(est == est2, "sketch must not depend on partitioning")
    }
  }

  test("HLL: linear-counting regime is near-exact for tiny cardinalities") {
    val est = spark.range(0, 10).toDF("v")
      .agg(SketchAggregates.hll(col("v"))).head().getLong(0)
    assert(est == 10L, s"tiny-range HLL should be exact, got $est")
  }

  test("HLL: null values are ignored") {
    val df = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("v")
    val est = df.agg(SketchAggregates.hll(col("v"))).head().getLong(0)
    assert(est == 2L)
  }

  test("CMS: never undercounts; exact when collisions are improbable") {
    // 3 distinct strings in a 2048-wide sketch: collision-free in practice
    val df = (Seq.fill(70)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .toDF("v").repartition(5)
    val r = df.agg(
      SketchAggregates.cmsEstimate(col("v"), lit("a")).as("ea"),
      SketchAggregates.cmsEstimate(col("v"), lit("b")).as("eb"),
      SketchAggregates.cmsEstimate(col("v"), lit("c")).as("ec"),
      SketchAggregates.cmsEstimate(col("v"), lit("zzz")).as("ez")).head()
    assert(r.getLong(0) == 70L && r.getLong(1) == 20L && r.getLong(2) == 10L)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 0L + 3,
      "absent key estimate bounded by collision mass")
  }

  test("CMS: non-constant query value fails analysis with a clear error") {
    val df = Seq("a", "b").toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(SketchAggregates.cmsEstimate(col("v"), col("v"))).collect()
    }
    assert(e.getMessage.contains("foldable"),
      s"expected a foldable-constraint error, got: ${e.getMessage}")
  }

  test("CMS: overshoot bounded by eps*N under heavy collisions") {
    // 10k distinct keys crammed into width 64 -> collisions guaranteed;
    // bound: est <= true + e/width * N at prob 1 - e^-depth
    val n = 10000L
    val df = spark.range(0, n).select(concat(lit("k"), col("id")).as("v"))
    val r = df.agg(
      SketchAggregates.cmsEstimate(col("v"), lit("k7"), depth = 5, width = 64)).head()
    val est = r.getLong(0)
    val bound = 1L + (math.E / 64 * n).toLong
    assert(est >= 1L, "CMS never undercounts")
    assert(est <= bound, s"est=$est exceeds eps*N bound $bound")
  }
}

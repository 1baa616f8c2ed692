package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout properties: the Morton expression interleaves bits
  * correctly, and the resulting file layout clusters BOTH interleaved
  * dimensions (per-file key ranges much narrower than a round-robin
  * layout's), which is what lets parquet min/max stats prune scans on
  * either column.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleaves bits (known values)") {
    val r = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (255L, 255L))
      .toDF("a", "b")
      .select(ZOrder.morton(col("a"), col("b"), 8).as("z"))
      .as[Long].collect().toSeq
    // z(5=101, 3=011) = a bits at even, b bits at odd:
    // pos0=1,pos1=1,pos2=0,pos3=1,pos4=1,pos5=0 -> 0b011011 = 27
    assert(r == Seq(0L, 1L, 2L, 3L, 27L, 65535L), s"got $r")
  }

  test("bucketize maps the value range onto [0, 2^bits) monotonically") {
    val r = Seq(0.0, 250000.0, 500000.0, -10.0, 600000.0).toDF("v")
      .select(ZOrder.morton(lit(0L),
        ZOrder.bucketize(col("v"), 0.0, 500000.0, 8), 8).as("z"))
      .as[Long].collect().toSeq
    assert(r(0) <= r(1) && r(1) <= r(2), "monotone inside the range")
    assert(r(3) == r(0), "below-lo clamps to the low end")
    assert(r(4) == r(2), "above-hi clamps to the high end")
  }

  test("z-order layout clusters both dimensions; round-robin clusters neither") {
    def perFileSpread(dir: String): (Double, Double) = {
      val withFile = spark.read.parquet(dir)
        .select(col("o_custkey"), col("o_totalprice"),
          input_file_name().as("f"))
      val spreads = withFile.groupBy(col("f"))
        .agg(((max(col("o_custkey")) - min(col("o_custkey"))) / 15000.0).as("ck"),
          ((max(col("o_totalprice")) - min(col("o_totalprice"))) / 499000.0).as("tp"))
        .agg(avg(col("ck")), avg(col("tp"))).head()
      (spreads.getDouble(0), spreads.getDouble(1))
    }
    val orders = Tables.load(spark, "/root/testdata/sf0.1", "orders")
    val tmpZ = s"${System.getProperty("java.io.tmpdir")}/graft_ztest_z"
    val tmpR = s"${System.getProperty("java.io.tmpdir")}/graft_ztest_r"
    orders
      .withColumn("zkey", ZOrder.morton(
        ZOrder.bucketize(col("o_custkey"), 0.0, 15000.0, 16),
        ZOrder.bucketize(col("o_totalprice"), 0.0, 500000.0, 16), 16))
      .repartitionByRange(16, col("zkey")).sortWithinPartitions(col("zkey"))
      .drop("zkey").write.mode("overwrite").parquet(tmpZ)
    orders.repartition(16).write.mode("overwrite").parquet(tmpR)

    val (zCk, zTp) = perFileSpread(tmpZ)
    val (rCk, rTp) = perFileSpread(tmpR)
    // round-robin files span essentially the full range on both dims
    assert(rCk > 0.9 && rTp > 0.9, s"round-robin spreads ($rCk, $rTp)")
    // z-order shrinks BOTH dims' per-file spread substantially — each
    // 1-of-16 zkey range bounds both interleaved coordinates
    assert(zCk < 0.5 && zTp < 0.5,
      s"z-order spreads ($zCk, $zTp) not clustered; round-robin ($rCk, $rTp)")
  }
}

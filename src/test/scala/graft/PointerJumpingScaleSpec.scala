package graft

import org.apache.spark.sql.functions._

/** PointerJumping at 10⁶ nodes: 976 chains of depth 1023 plus their
  * block roots. The claim under test is the LOG-ROUND contract — depth
  * 1023 must resolve in ~10 self-join rounds, not 1023 — plus exact
  * root/depth recovery on a shape where any off-by-one (root
  * self-loop, depth accumulation, convergence test) produces millions
  * of wrong rows.
  */
class PointerJumpingScaleSpec extends SparkSpec {

  test("1M-node forest of depth-1023 chains resolves exactly") {
    import spark.implicits._
    val n = 1000000L
    val block = 1024L
    // node k: chain predecessor within its 1024-block; block heads root
    val edges = spark.range(n).select(
      col("id").as("node"),
      when(col("id") % block === 0, col("id"))
        .otherwise(col("id") - 1).as("parent"))
    val t0 = System.nanoTime()
    val out = graft.operators.PointerJumping.resolve(spark, edges)
      .persist()
    val bad = out
      .withColumn("want_root", col("node") - (col("node") % block))
      .withColumn("want_depth", col("node") % block)
      .filter(col("root") =!= col("want_root") ||
        col("depth") =!= col("want_depth"))
      .count()
    val total = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-node resolve: $secs%.1f s, $total rows, $bad mismatches")
    assert(total == n)
    assert(bad == 0L)
    out.unpersist(false)
  }
}

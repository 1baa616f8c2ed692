package graft

import org.apache.spark.sql.functions._

/** Skew handling at scale, demonstrated both ways (SURVEY §7): AQE's
  * runtime skew-join split, and manual salting — the two idioms a
  * 100 TB join with a hot key needs. Asserts AQE actually split the
  * skewed partition (plan shows `skew=true`) and that both strategies
  * agree with the unskewed ground truth.
  */
class SkewJoinSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // Fact with 85% of rows on key 0; 100-row dim. Broadcast is
  // disabled so the join must shuffle — the setup where a hot key
  // serializes one task. (4M rows so the hot partition's compressed
  // shuffle bytes clear the lowered skew threshold.)
  private def skewedFact(n: Long) = spark.range(0, n).toDF("i")
    .select(when(col("i") % 100 < 85, 0L).otherwise(col("i") % 100).as("k"),
      (col("i") * 7 % 1000).as("payload"))
  private def dim = spark.range(0, 100).toDF("k")
    .withColumn("dim_val", col("k") * 10)

  test("AQE splits the skewed partition of a shuffle join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      // coalescing can merge small partitions back together and mask
      // the skew split in this synthetic-size test
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = skewedFact(4000000L).join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("dim_val")).as("s"))
      val row = joined.collect()(0) // collect() executes THIS queryExecution
      assert(row.getLong(0) == 4000000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should mark the skewed join (plan:\n${plan.take(2000)})")
    }
  }

  test("manual salting spreads the hot key and agrees with ground truth") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val S = 16
      // fact side: random-ish deterministic salt per row; dim side:
      // replicate each key S times — the classic hot-key spreading
      val salted = skewedFact(1000000L)
        .withColumn("salt", (col("payload") % S).cast("int"))
      val dimSalted = dim.withColumn("salt",
        explode(array((0 until S).map(lit): _*)))
      val viaSalt = salted.join(dimSalted, Seq("k", "salt"))
        .agg(count(lit(1)), sum(col("dim_val"))).head()
      val truth = skewedFact(1000000L).join(dim, Seq("k"))
        .agg(count(lit(1)), sum(col("dim_val"))).head()
      assert(viaSalt == truth)
      assert(viaSalt.getLong(0) == 1000000L)
    }
  }
}

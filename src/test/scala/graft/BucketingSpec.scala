package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled storage layout → co-located join with no
  * Exchange on either side (the 100 TB co-location strategy from
  * SURVEY §4, demonstrated at spec scale).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without shuffle exchanges") {
    // tables land in the default warehouse (./spark-warehouse, gitignored)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val liTbl = s"li_bkt_${System.nanoTime()}"
    val ordTbl = s"ord_bkt_${System.nanoTime()}"
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liTbl)
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordTbl)
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val joined = spark.table(liTbl)
        .join(spark.table(ordTbl), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS $liTbl")
      spark.sql(s"DROP TABLE IF EXISTS $ordTbl")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions.{bloom, bloomContains}

/** Bloom build/probe contract: zero false negatives, bounded false
  * positives, merge insensitivity to partitioning, null handling, and
  * the SQL surface — properties the value-equality oracle can't see.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; FPR within design bound") {
    val members = spark.range(0, 10000).toDF("v")
    val bf = members.repartition(13) // exercise the OR-merge path
      .agg(bloom(col("v"), numBits = 1 << 17, numHashes = 7).as("bf"))
    // every member must probe true
    val misses = members.crossJoin(broadcast(bf))
      .filter(!bloomContains(col("bf"), col("v"))).count()
    assert(misses == 0L, s"$misses false negatives — violates Bloom's contract")
    // non-members: m/n ≈ 13 bits/key, k=7 → theoretical FPR ≈ 0.3%;
    // assert under 1% on a disjoint 10k probe set
    val fp = spark.range(1000000, 1010000).toDF("v").crossJoin(broadcast(bf))
      .filter(bloomContains(col("bf"), col("v"))).count()
    assert(fp <= 100L, s"false-positive rate ${fp / 100.0}% exceeds 1%")
  }

  test("filter bytes are independent of partitioning; nulls ignored") {
    val a = spark.range(0, 5000).toDF("v").repartition(3)
      .agg(bloom(col("v")).as("bf")).head().getAs[Array[Byte]](0)
    val b = spark.range(0, 5000).toDF("v").repartition(29)
      .agg(bloom(col("v")).as("bf")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b), "OR-merge must be partitioning-insensitive")

    val withNulls = Seq(Some(1L), None, Some(2L)).toDF("v")
      .agg(bloom(col("v")).as("bf")).head().getAs[Array[Byte]](0)
    val noNulls = Seq(1L, 2L).toDF("v")
      .agg(bloom(col("v")).as("bf")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(withNulls, noNulls), "nulls must not set bits")
  }

  test("works over strings; disjoint key spaces separate") {
    val bf = Seq("alpha", "beta", "gamma").toDF("s")
      .agg(bloom(col("s"), numBits = 4096, numHashes = 5).as("bf"))
    val probed = Seq("alpha", "delta", "gamma", "zeta").toDF("s")
      .crossJoin(broadcast(bf))
      .select(col("s"), bloomContains(col("bf"), col("s")).as("hit"))
      .orderBy("s").as[(String, Boolean)].collect()
    assert(probed.filter(_._2).map(_._1).toSet.contains("alpha"))
    assert(probed.find(_._1 == "gamma").exists(_._2))
    // 4096 bits / 3 keys: false positives on 2 probes are ~impossible
    assert(!probed.find(_._1 == "delta").exists(_._2))
    assert(!probed.find(_._1 == "zeta").exists(_._2))
  }

  test("SQL surface: graft_bloom + graft_bloom_contains") {
    graft.functions.GraftFunctions.register(spark)
    spark.range(0, 100).toDF("v").createOrReplaceTempView("bloom_members")
    val r = spark.sql(
      """WITH f AS (SELECT graft_bloom(v) AS bf FROM bloom_members)
        |SELECT count(*) AS hits
        |FROM bloom_members, f WHERE graft_bloom_contains(f.bf, v)""".stripMargin)
      .head().getLong(0)
    assert(r == 100L, "all members must probe true through SQL")
  }

  test("probing a non-binary filter fails analysis with a clear error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").select(bloomContains(col("v"), col("v"))).collect()
    }
    assert(e.getMessage.contains("BINARY"),
      s"expected a BINARY-type error, got: ${e.getMessage}")
  }
}

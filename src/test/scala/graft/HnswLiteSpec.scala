package graft

import org.apache.spark.sql.functions._

import graft.operators.{HnswLite, IvfIndex}

/** HNSW-lite contract on planted clusters (the IvfSpec pattern):
  * beam-searched top-k must recover the exact brute-force neighbors on
  * clustered data, while the bottom-layer expansion touches a bounded
  * corpus fraction — the two numbers that justify a hierarchy instead
  * of a flat scan.
  */
class HnswLiteSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16

  test("50k vectors: beam search recall@5 >= 0.8, bounded candidate fraction") {
    val n = 50000L
    // 8 planted clusters (AnnScaleSpec's generator)
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 8) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 9970.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true)
    val queries = e.filter(col("vec_id") < 10)
    val hnsw = HnswLite.search(e, queries, "vec_id", "v", k = 5)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(
        queries.select(col("vec_id").as("qid"), col("v").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (hnsw intersect exact).size.toDouble / exact.size
    info(f"HNSW-lite 50k recall@5 = $recall%.2f")
    assert(recall >= 0.8, s"recall@5 $recall below 0.8 on planted clusters")

    // touched-fraction: replicate the beam's bottom expansion and count
    // candidates — the hierarchy must NOT degenerate into a full scan
    val fanout = 16
    val l1 = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit((n / fanout).toInt)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
      .localCheckpoint(true)
    val sizes = IvfIndex.assignOne(e, l1, "vec_id", "v")
      .groupBy(col("cid")).agg(count(lit(1)).as("sz"))
      .select(col("sz")).as[Long].collect()
    // beamMid = 8 L1 parents per query; worst case = the 8 biggest lists
    val worstTouched = sizes.sorted.reverse.take(8).sum.toDouble / n
    info(f"worst-case bottom-layer touch: ${worstTouched * 100}%.1f%% of corpus")
    assert(worstTouched <= 0.05,
      f"beam expansion touches ${worstTouched * 100}%.1f%% — hierarchy degenerated")
  }
}

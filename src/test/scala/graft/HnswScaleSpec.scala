package graft

import org.apache.spark.sql.functions._

import graft.operators.HnswLite

/** The routed HNSW-lite build at probe scale, mirroring AnnScaleSpec:
  * 10⁶ executor-generated clustered vectors through the exact
  * [[HnswLite.search]] the query ships. At this size the hierarchy is
  * 3 levels deep (62500 / 3907 / 245) and BOTH the corpus and the L1
  * edge builds take the routed path (n·|parents| far past the flat-
  * argmin budget) — this is the measured decade behind the linear-
  * build claim: a flat L1 assignment would be 10⁶·62500 = 6.25·10¹⁰
  * distance evaluations; routing does ~10⁶·(245 + 2·4·16) ≈ 3.7·10⁸.
  * Recall on planted clusters gates the routed approximation.
  */
class HnswScaleSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16

  test("1M vectors: routed 3-level build + beam search, recall@5 on planted clusters") {
    val n = 1000000L
    // 64 planted clusters (the HnswSweepSpec generator at 20× docs)
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 64) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 9970.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true)
    val queries = e.filter(col("vec_id") < 10)

    val t0 = System.nanoTime()
    val hnsw = HnswLite.search(e, queries, "vec_id", "v", k = 5)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    val sec = (System.nanoTime() - t0) / 1e9

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
    info(f"1M routed HNSW: build+search $sec%.1f s, recall@5 = $recall%.2f")
    assert(recall >= 0.8, s"recall@5 $recall below 0.8 at 1M on planted clusters")
  }
}

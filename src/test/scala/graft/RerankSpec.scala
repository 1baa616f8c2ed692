package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** D26's defining property: the two-stage shortlist (uint8-quantized
  * first pass, top-32) must recover the EXACT top-10 almost perfectly —
  * the affine uint8 reconstruction bounds each coordinate's error at
  * scale/2, so approx-cosine ordering only swaps true near-ties, and a
  * 32-deep shortlist absorbs those swaps before the exact rescore.
  * Measured recall@10 = 60/60 = 1.0 at sf0.01 (DuckDB cross-check of
  * the Verify dump); pinned at ≥ 0.9 to leave room for corpus
  * regeneration.
  */
class RerankSpec extends SparkSpec {

  test("two-stage rerank recovers the exact top-10 (recall >= 0.9)") {
    val rerank = SparkEntry.queries("knn_two_stage_rerank")(spark, sfDir)
      .select(col("qid"), col("nid"))
    val all = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = all.filter(col("vec_id") <= 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val exact = all.select(col("vec_id").as("nid"), col("v").as("nv"))
      .join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("nid"))
    val denom = exact.count()
    val hits = exact.join(rerank, Seq("qid", "nid")).count()
    assert(denom > 0)
    val recall = hits.toDouble / denom
    assert(recall >= 0.9, s"rerank recall@10 = $recall ($hits/$denom)")
  }
}

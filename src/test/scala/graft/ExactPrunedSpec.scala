package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** D16 contract: the Elkan-style list-pruned scan must (a) reproduce the
  * brute-force top-10 EXACTLY — the bound is a certificate, not a recall
  * knob — and (b) actually skip most lists on clustered data, or the
  * "pruned" scan is a full scan with extra steps.
  */
class ExactPrunedSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16

  test("20k planted clusters: pruned scan is exact and skips most lists") {
    val n = 20000L
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 8) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 9970.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true)

    val (surv, result) = SimilarityQueries.exactPrunedParts(e)
    val got = result.select(col("qid"), col("rn"), col("nid"))
      .as[(Long, Long, Long)].collect().toSet

    val w = Window.partitionBy(col("qid")).orderBy(col("ip").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(
        e.filter(col("vec_id") <= 9)
          .select(col("vec_id").as("qid"), col("v").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("ip", VectorOps.dot(col("qv"), col("v")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("rn"), col("vec_id"))
      .as[(Long, Long, Long)].collect().toSet

    assert(got == exact,
      s"pruned result diverged from brute force: ${(got diff exact).take(5)} / ${(exact diff got).take(5)}")

    val perQuery = surv.groupBy(col("qid")).agg(count(lit(1)).as("n_lists"))
      .agg(avg(col("n_lists")), max(col("n_lists")))
      .as[(Double, Long)].head()
    info(f"avg survivor lists/query = ${perQuery._1}%.1f of 16, max = ${perQuery._2}")
    assert(perQuery._1 <= 8.0,
      s"pruning ineffective: avg ${perQuery._1} of 16 lists survive")
  }
}

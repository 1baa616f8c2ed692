package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** IVF at probe scale: 300k synthetic vectors generated ON THE
  * EXECUTORS (spark.range + LCG column expressions — no driver data),
  * quantizer trained on a 5k SAMPLE (the 100 TB recipe: training cost
  * must not scale with the corpus), full corpus assigned once. Proves
  * the shapes the ANN tier claims: sample-trained centroids spread
  * the full corpus across lists (no degenerate mega-list), and probing
  * nprobe lists touches the expected corpus fraction.
  */
class AnnScaleSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16
  private val k = 8

  test("sample-trained IVF balances 300k vectors; probe touches ~nprobe/k") {
    // 8 planted clusters: center from the cluster id, noise from the
    // vector id — all integer-LCG arithmetic inside codegen
    val n = 300000L
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 8) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 9970.0D
         |)""".stripMargin).as("v"))
    val sample = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(5000)
    val cent = IvfIndex.trainCentroids(sample, "vec_id", "v", k, iters = 3)
    val sizes = IvfIndex.assign(e, cent, "vec_id", "v", keep = 1)
      .groupBy(col("cid")).agg(count(lit(1)).as("sz"))
      .select(col("sz")).as[Long].collect().sorted.toSeq
    assert(sizes.sum == n, "every vector lands in exactly one list")
    assert(sizes.size == k, "no empty inverted lists on clustered data")
    // balance: the largest list must not dominate (degenerate layout
    // = one mega-list = probing touches everything)
    assert(sizes.max <= n / 2,
      s"mega-list: sizes=$sizes — quantizer failed to spread the corpus")
    // probing 2 of k lists touches a bounded corpus fraction
    val probed = sizes.sorted.reverse.take(2).sum.toDouble / n
    assert(probed <= 0.5, s"nprobe=2 would touch ${probed * 100}% of the corpus")
  }
}

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

  test("1M vectors: sample-trained IVF balances lists, probe recall vs brute force") {
    val n = 1000000L
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 8) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 9970.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true) // materialize so timings measure ANN, not the generator
    // training cost must not scale with the corpus: 5k sample, as at 300k
    val t0 = System.nanoTime()
    val sample = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(5000)
    val cent = IvfIndex.trainCentroids(sample, "vec_id", "v", k, iters = 3)
    val trainSec = (System.nanoTime() - t0) / 1e9
    // full-corpus list build through the shuffle-free argmin
    val t1 = System.nanoTime()
    val sizes = IvfIndex.assign(e, cent, "vec_id", "v", keep = 1)
      .groupBy(col("cid")).agg(count(lit(1)).as("sz"))
      .select(col("sz")).as[Long].collect().sorted.toSeq
    val assignSec = (System.nanoTime() - t1) / 1e9
    assert(sizes.sum == n && sizes.size == k)
    assert(sizes.max <= n / 2, s"mega-list at 1M: $sizes")
    // IVF top-5 for 10 queries vs exact brute-force cosine top-5
    val queries = e.filter(col("vec_id") < 10)
    val t2 = System.nanoTime()
    val ivf = IvfIndex.search(e, queries, cent, "vec_id", "v", nprobe = 2, k = 5)
      .select(col("qid"), col("nid"))
      .as[(Long, Long)].collect().toSet
    val searchSec = (System.nanoTime() - t2) / 1e9
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(
        queries.select(col("vec_id").as("qid"), col("v").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", graft.VectorOps.cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    info(f"1M IVF: train $trainSec%.1f s, assign $assignSec%.1f s, " +
      f"search $searchSec%.1f s, recall@5 $recall%.2f")
    assert(recall >= 0.8, s"recall@5 $recall below 0.8 on planted clusters")
  }
}

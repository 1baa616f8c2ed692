package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** PQ at probe scale — the AnnScaleSpec treatment for the ADC tier:
  * 10⁶ synthetic vectors generated on the executors (spark.range +
  * LCG column expressions, no driver data), joint codebooks trained
  * on a 5k SAMPLE (training cost must not scale with the corpus),
  * the full corpus encoded once through the shuffle-free argmin, and
  * the D9 contract (ADC pool → exact re-rank) measured for recall
  * against exact brute force.
  *
  * Data shape matters for what PQ can see: 8 well-separated planted
  * clusters with BROAD intra-cluster noise, quantized by m=8
  * two-dim subspaces of k=16 codes. The noise spread exceeds the
  * quantization cell size, so within-cluster variation lands in
  * distinct code cells (~2 cells per cluster per subspace ⇒ ~2⁸
  * sub-cells per cluster) and the ADC ranking discriminates INSIDE
  * the winning cluster — the regime PQ is built for. Tight clusters
  * would instead tie all 125k members on one code word (that is PQ
  * working too, but then only a cluster-sized pool recovers top-5 —
  * see PqSpec's pool note at toy scale).
  */
class PqScaleSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 8
  private val k = 16

  test("1M vectors: sample-trained PQ encodes shuffle-free; ADC pool + re-rank recall@5") {
    val n = 1000000L
    // centers ±5 from the cluster id; noise ±0.5 from the vector id —
    // 10× AnnScaleSpec's spread so quantization cells subdivide it
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 8) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 997.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true) // materialize so timings measure PQ, not the generator
    // training on a 5k sample — the 100 TB recipe
    val t0 = System.nanoTime()
    val sample = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(5000)
    val book = ProductQuantizer.train(sample, "vec_id", "v", m, dim, k, iters = 3)
    val trainSec = (System.nanoTime() - t0) / 1e9
    // full-corpus encode through the argmin path: n·m code rows, no shuffle
    val t1 = System.nanoTime()
    val codes = ProductQuantizer.assignCodes(
      ProductQuantizer.subVectors(e, "vec_id", "v", m, dim), book)
      .localCheckpoint(true)
    val encodeSec = (System.nanoTime() - t1) / 1e9
    assert(codes.count() == n * m, "exactly one code per (vector, subspace)")
    assert(codes.filter(col("cid") < 0 || col("cid") >= k).isEmpty,
      s"codes must stay in [0, $k)")
    // no degenerate codebook: in every subspace the hottest code must
    // not swallow the corpus (that would collapse ADC to a constant)
    val hottest = codes.groupBy(col("sub"), col("cid"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("sub")).agg(max(col("c")).as("mx"))
      .select(max(col("mx"))).as[Long].head()
    assert(hottest <= n / 2, s"a single code holds $hottest of $n vectors")
    // D9 contract at scale: ADC top-pool, then exact re-rank of the pool
    val q = e.filter(col("vec_id") < 10)
    val t2 = System.nanoTime()
    val pool = ProductQuantizer.adcTopPool(codes, book, q, "vec_id", "v",
      m, dim, pool = 600)
      .localCheckpoint(true)
    val wE = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val pq = pool
      .join(e.select(col("vec_id").as("nid"), col("v").as("nv")), Seq("nid"))
      .join(broadcast(q.select(col("vec_id").as("qid"), col("v").as("qv"))), Seq("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(wE))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("nid"))
      .as[(Long, Long)].collect().toSet
    val searchSec = (System.nanoTime() - t2) / 1e9
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(
        q.select(col("vec_id").as("qid"), col("v").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    // the pool must also stay in the right REGION: candidates from the
    // query's planted cluster (PQ's coarse job before the fine ranking)
    val clusterPrec = pool
      .withColumn("ok", (col("nid") % 8) === (col("qid") % 8))
      .agg(avg(col("ok").cast("double"))).as[Double].head()
    info(f"1M PQ: train $trainSec%.1f s, encode $encodeSec%.1f s, " +
      f"adc+rerank $searchSec%.1f s, recall@5 $recall%.2f, " +
      f"pool cluster-precision $clusterPrec%.2f")
    assert(clusterPrec >= 0.95,
      f"ADC pool wanders out of the query's cluster ($clusterPrec%.2f)")
    assert(recall >= 0.6, s"ADC+re-rank recall@5 $recall below 0.6 at 1M")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** Product quantizer: codebook shape, exact-code compression (one
  * code per (vector, subspace), codes in range), reconstruction on
  * planted per-subspace structure, and ADC-pool recall vs brute force
  * on clustered data.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val m = 8

  private def prand(seed: Long): Double = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    x ^= x >>> 33; x *= -49064778989728563L; x ^= x >>> 33
    (x >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  private def randVec(seed: Long): Array[Double] =
    Array.tabulate(dim)(d => prand(seed * 131 + d))

  private def nearDup(base: Array[Double], seed: Long): Array[Double] =
    base.zipWithIndex.map { case (v, d) => v + 0.05 * prand(seed * 977 + d) }

  private def clustered: DataFrame = {
    val rows = for {
      c <- 0 until 8
      mm <- 0 until 25
    } yield {
      val id = (c * 25 + mm).toLong
      val center = randVec(c + 4000L)
      (id, if (mm == 0) center else nearDup(center, id + 90000L))
    }
    rows.toDF("vec_id", "v")
  }

  test("codebook has m x k entries of dim/m dims; codes are in range, one per (id, sub)") {
    val e = clustered
    val book = ProductQuantizer.train(e, "vec_id", "v", m, dim, k = 4, iters = 2)
    val entries = book.select("sub", "cid").as[(Long, Long)].collect()
    assert(entries.length == m * 4 && entries.toSet.size == m * 4)
    assert(book.select(size(col("cv"))).as[Int].collect().forall(_ == dim / m))
    val codes = ProductQuantizer.assignCodes(
      ProductQuantizer.subVectors(e, "vec_id", "v", m, dim), book)
      .as[(Long, Long, Long)].collect()
    val n = e.count()
    assert(codes.length == n * m, "exactly one code per (vector, subspace)")
    assert(codes.forall { case (_, sub, cid) =>
      sub >= 0 && sub < m && cid >= 0 && cid < 4 })
  }

  test("ADC pool + exact re-rank reaches recall@5 >= 0.8 on planted clusters") {
    val e = clustered
    val book = ProductQuantizer.train(e, "vec_id", "v", m, dim, k = 8, iters = 3)
    val codes = ProductQuantizer.assignCodes(
      ProductQuantizer.subVectors(e, "vec_id", "v", m, dim), book)
    val q = e.filter(col("vec_id") % 25 === 0)
    // pool must EXCEED the quantization-cell collision count: every
    // cluster member shares codes (that's PQ working — 25 vectors,
    // one code word), so ADC ties the whole cluster and only a pool
    // larger than the cluster guarantees the true top-5 reach the
    // exact re-rank. pool=10 < 25 measurably caps recall at ~0.5.
    val pool = ProductQuantizer.adcTopPool(codes, book, q, "vec_id", "v",
      m, dim, pool = 30)
    val approx = pool.select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val exact = e.select(col("vec_id").as("nid"), col("v").as("nv"))
      .join(broadcast(q.select(col("vec_id").as("qid"), col("v").as("qv"))),
        col("nid") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, truth) =>
      truth.intersect(approx.getOrElse(qid, Set.empty)).size.toDouble / truth.size
    }
    val macroRecall = recalls.sum / recalls.size
    assert(macroRecall >= 0.8, s"ADC recall@5 $macroRecall below 0.8")
  }

  test("training is deterministic: two runs produce identical codebooks") {
    val e = clustered
    val b1 = ProductQuantizer.train(e, "vec_id", "v", m, dim, k = 4, iters = 2)
      .orderBy("sub", "cid").as[(Long, Long, Seq[Double])].collect().toSeq
    val b2 = ProductQuantizer.train(e, "vec_id", "v", m, dim, k = 4, iters = 2)
      .orderBy("sub", "cid").as[(Long, Long, Seq[Double])].collect().toSeq
    assert(b1 == b2)
  }
}

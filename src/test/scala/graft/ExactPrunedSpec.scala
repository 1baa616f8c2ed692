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

  test("antipodal queries with varied norms: negative-cos bound branch stays exact") {
    // The regime ADVICE flagged: every query ip is negative, so the
    // bound factor cfac < 0 for clean lists and the per-list max ip
    // comes from the SMALLEST-norm member — using maxn there (the
    // pre-fix bound) understates the list max and wrongly prunes lists
    // that hold true top-10 rows (verified: with the maxn-only bound
    // this test fails, every query losing its rank-10 row).
    // Geometry (all deterministic, no RNG): queries = shifted simplex
    // s_i = e_{1+i} − 0.05·Σ_{j=1..10} e_j (pairwise ip −0.075 < 0,
    // s_i·s̄ = +0.158 for every i) anchored at 8·e14 so they corral
    // into one list; data = n·(u_dir − (δ+η)·s̄) on 8 axis-aligned
    // directions u ∈ {±e0, ±e11, ±e12, ±e13} ⊥ both the query simplex
    // and the anchor. Every query×data ip = −n·(δ+η)·0.158 < 0; the
    // contested rank-10 row is the global min of n·(δ+η), and the
    // farthest-point init splits each direction into norm bands whose
    // maxn/minn ≈ 1.4 — exactly the spread that makes the pre-fix
    // maxn·cfac bound overshoot B and wrongly prune the winner's list.
    val delta = 0.3; val etaR = 0.0005; val kappa = 0.0008
    val sbar = 1.0 / math.sqrt(10.0)
    def qvec(i: Int): Seq[Double] = {
      val v = Array.fill(dim)(0.0)
      v(1 + i) = 1.0
      for (j <- 1 to 10) v(j) -= 0.05
      v(14) = 8.0
      v.toSeq
    }
    val axes = Array((0, 1.0), (0, -1.0), (11, 1.0), (11, -1.0),
      (12, 1.0), (12, -1.0), (13, 1.0), (13, -1.0))
    def dvec(id: Int): Seq[Double] = {
      val (ax, sign) = axes(id % 8)
      val nRaw = 8.0 + 8.0 * (((id * 7919) % 997) / 997.0)
      val eta = ((((id * 104729) % 2001) - 1000) / 1000.0) * etaR +
        kappa * (nRaw - 12.0) / 4.0
      val v = Array.fill(dim)(0.0)
      v(ax) = sign
      for (j <- 1 to 10) v(j) -= (delta + eta) * sbar
      v.map(_ * nRaw).toSeq
    }
    val rows = (0 until 10).map(i => (i.toLong, qvec(i))) ++
      (10 until 4000).map(id => (id.toLong, dvec(id)))
    val e = rows.toDF("vec_id", "v").repartition(8).localCheckpoint(true)

    val (_, result) = SimilarityQueries.exactPrunedParts(e)
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
      s"antipodal pruned result diverged from brute force: ${(got diff exact).take(5)} / ${(exact diff got).take(5)}")
  }
}

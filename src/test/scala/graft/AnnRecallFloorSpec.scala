package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, ProductQuantizer, RandomHyperplaneLsh}

/** SPEC-ENFORCED recall floors for the ANN tier (VERDICT r8 ask #2):
  * the D-tier quality numbers previously lived in probe JSONs and
  * comments — here they are `sbt test` gates, so a future
  * "optimization" cannot silently buy speed with recall.
  *
  * Corpus: planted clusters written as a REAL embeddings.parquet and
  * driven through the REGISTRY queries themselves (not re-built
  * spec-local pipelines), so the floors bind the exact production
  * composition — geometry constants, refinement rounds, pool sizes
  * and all. 4000 vectors, 8 clusters, 64 dims: big enough that LSH
  * buckets and IVF lists have real occupancy, small enough for an
  * exact brute-force reference in-suite.
  */
class AnnRecallFloorSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val n = 4000L

  /** Planted-cluster corpus: center from the cluster id (same integer
    * LCG family as the LSH planes), noise from the vector id — all
    * deterministic column arithmetic, no driver data.
    */
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_annfloor").toString
    spark.range(n).select(
        col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, ${dim - 1}), d ->
             | CAST(CAST((1103 * ((id % 8) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
             | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 997.0D
             | AS FLOAT))""".stripMargin).as("embedding"),
        (col("id") % 8).cast("int").as("label"))
      .coalesce(4)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def vecs: DataFrame =
    Tables.load(spark, corpusDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Exact brute-force top-k edges for a probe set. */
  private def bruteTopK(probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    vecs.select(col("vec_id").as("nid"), col("v").as("nv"))
      .join(broadcast(probes), col("nid") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"))
  }

  test("knn_graph (production geometry): recall@3 >= 0.85 on planted clusters") {
    // the registry query end-to-end: exact-vector collapse, adaptive
    // bits, tables=4, cap=64, two NN-descent rounds, mutual tagging
    val g = SimilarityQueries.queries("knn_graph")(spark, corpusDir)
      .select(col("qid"), col("nid"))
      .localCheckpoint(true)
    assert(g.count() == n * 3, "every node must carry 3 edges")
    val probes = vecs
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(200)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .localCheckpoint(true)
    val exact = bruteTopK(probes, 3).localCheckpoint(true)
    val hit = exact.join(g, Seq("qid", "nid")).count()
    val recall = hit.toDouble / exact.count()
    info(f"knn_graph recall@3 on 200 probes: $recall%.4f")
    assert(recall >= 0.85,
      f"knn_graph recall@3 $recall%.4f fell below the 0.85 floor " +
        "(sf1/sf10 probes measured 0.93; a geometry or refinement " +
        "change bought speed with recall)")
  }

  test("knn_ivf_trained: the query's own recall contract holds on planted clusters") {
    val row = SimilarityQueries.queries("knn_ivf_trained")(spark, corpusDir)
      .collect().head
    assert(row.getAs[Long]("n_queries") == 11L)
    assert(row.getAs[Boolean]("ivf_recall_ok"),
      "trained-IVF macro recall@3 vs brute force fell below the 0.7 " +
        "contract on a planted-cluster corpus")
  }

  test("knn_ivfpq_residual: the query's own recall contract holds on planted clusters") {
    val row = SimilarityQueries.queries("knn_ivfpq_residual")(spark, corpusDir)
      .collect().head
    assert(row.getAs[Long]("n_queries") == 11L)
    assert(row.getAs[Boolean]("ivf_recall_ok"),
      "residual IVF-PQ macro recall@3 vs brute force fell below the " +
        "0.7 contract on a planted-cluster corpus")
  }

  test("knn_hnsw: the query's own recall contract holds on planted clusters") {
    // D12 end-to-end on the registry corpus: the layered-pivot beam
    // search must keep its in-query recall gate (avg recall@3 vs brute
    // force >= 0.7) on data with real cluster structure, not just the
    // 50k planted one-off in HnswLiteSpec.
    val row = SimilarityQueries.queries("knn_hnsw")(spark, corpusDir)
      .collect().head
    assert(row.getAs[Long]("n_queries") == 11L)
    assert(row.getAs[Boolean]("hnsw_recall_ok"),
      "HNSW-lite recall vs brute force fell below the 0.7 contract on " +
        "a planted-cluster corpus")
  }

  test("knn_binary_hamming: recall@5 >= 0.65 vs brute force on planted clusters") {
    // D18 end-to-end: the 64-bit sign-code Hamming prefilter (top-50)
    // + exact re-rank — the one-off spec only pinned Hamming-0 mates.
    // The floor is 0.65, NOT the 0.85 of the finer tiers, and that is
    // the operator's honest behavior, not slack: on tight planted
    // clusters (500 members sharing nearly every sign bit) hundreds of
    // candidates TIE at hamming ≈ 0, the top-50 tie-breaks by id, and
    // the code simply cannot rank inside a cluster — the documented
    // saturation regime of 1-bit-per-dimension codes (measured 0.6909
    // here, deterministic). Regressions below 0.65 mean the code or
    // re-rank broke, not the tie-break.
    val got = SimilarityQueries.queries("knn_binary_hamming")(spark, corpusDir)
      .select(col("qid"), col("nid")).localCheckpoint(true)
    val probes = vecs.filter(col("vec_id") <= 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .localCheckpoint(true)
    val exact = bruteTopK(probes, 5).localCheckpoint(true)
    val recall = got.join(exact, Seq("qid", "nid")).count().toDouble /
      exact.count()
    info(f"knn_binary_hamming recall@5: $recall%.4f")
    assert(recall >= 0.65,
      f"binary-Hamming recall@5 $recall%.4f fell below the 0.65 floor")
  }

  test("knn_two_stage_rerank: recall@10 >= 0.85 vs brute force on planted clusters") {
    // D26 end-to-end: the int8-reconstruction shortlist (32) + exact
    // re-rank must recover the true top-10 on clustered data.
    val got = SimilarityQueries.queries("knn_two_stage_rerank")(spark, corpusDir)
      .select(col("qid"), col("nid")).localCheckpoint(true)
    val probes = vecs.filter(col("vec_id") <= 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .localCheckpoint(true)
    val exact = bruteTopK(probes, 10).localCheckpoint(true)
    val recall = got.join(exact, Seq("qid", "nid")).count().toDouble /
      exact.count()
    info(f"knn_two_stage_rerank recall@10: $recall%.4f")
    assert(recall >= 0.85,
      f"two-stage-rerank recall@10 $recall%.4f fell below the 0.85 floor")
  }

  test("residual-PQ LUT: approx_ip reconstructs q·c + <q-c, x-c> exactly when codes are exact") {
    // VERDICT r8 ask #4: the residual encoding itself was gated only
    // by the recall floor. Plant a corpus where PQ reconstruction is
    // EXACT — 16 distinct residual patterns, each appearing exactly
    // twice (sums of two equal doubles and /2 are exact), k=16 — so
    // the LUT identity approx_ip = q_dot_c + <q-c, x-c> must hold to
    // float-reassociation tolerance; any LUT math slip breaks it.
    val m = 8
    val pts = spark.range(32).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((997 * ((id % 16) * $dim + d) + 131) % 257 - 128 AS DOUBLE) / 64.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true)
    // one coarse centroid: the exact per-dimension mean (computed in
    // SQL, not Lloyd; sort_array pins the dimension order)
    val cent = pts
      .select(explode(expr(s"transform(sequence(0, ${dim - 1}), " +
        "d -> struct(d AS d, element_at(v, d + 1) AS x))")).as("e"))
      .groupBy(col("e.d")).agg(avg(col("e.x")).as("cx"))
      .agg(expr("transform(array_sort(collect_list(struct(d, cx))), s -> s.cx)")
        .as("cv"))
      .select(lit(0).as("cid"), col("cv"))
      .localCheckpoint(true)
    val asg = pts.join(broadcast(cent))
      .withColumn("res", expr("zip_with(v, cv, (a, b) -> a - b)"))
      .select(col("vec_id"), col("res"), col("v"), col("cv"))
      .localCheckpoint(true)
    val book = ProductQuantizer.train(
      asg.select(col("vec_id"), col("res")), "vec_id", "res",
      m = m, dim = dim, k = 16, iters = 4)
    val codes = ProductQuantizer.assignCodes(
      ProductQuantizer.subVectors(asg.select(col("vec_id"), col("res")),
        "vec_id", "res", m = m, dim = dim), book)
      .select(col("id").as("nid"), col("sub"), col("cid").as("code"))
    // queries = first 4 points; LUT per (query, sub, code)
    val q = asg.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("res").as("qres"),
        VectorOps.dot(col("v"), col("cv")).as("q_dot_c"))
      .localCheckpoint(true)
    val lut = ProductQuantizer.subVectors(
        q.select(col("qid"), col("qres")), "qid", "qres", m = m, dim = dim)
      .join(broadcast(book), Seq("sub"))
      .select(col("id").as("qid"), col("sub"), col("cid").as("code"),
        VectorOps.dot(col("sv"), col("cv")).as("dotp"))
    val approx = codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("qid"), col("nid")).agg(sum(col("dotp")).as("radot"))
      .join(broadcast(q.select(col("qid"), col("q_dot_c"))), Seq("qid"))
      .withColumn("approx_ip", col("q_dot_c") + col("radot"))
    // exact q·c + <q−c, x−c> per pair
    val exact = asg.select(col("vec_id").as("nid"), col("res").as("nres"))
      .crossJoin(broadcast(q.select(col("qid"), col("qres"), col("q_dot_c"))))
      .withColumn("exact_ip",
        col("q_dot_c") + VectorOps.dot(col("qres"), col("nres")))
      .select(col("qid"), col("nid"), col("exact_ip"))
    val worst = approx.join(exact, Seq("qid", "nid"))
      .select(max(abs(col("approx_ip") - col("exact_ip"))).as("err"))
      .as[Double].collect().head
    info(f"max |approx_ip - exact_ip| = $worst%.3e over ${4 * 32} pairs")
    assert(worst <= 1e-9,
      f"LUT reconstruction diverged from exact <q-c, x-c> by $worst%.3e " +
        "on a corpus where PQ codes are exact — the ADC table math broke")
  }
}

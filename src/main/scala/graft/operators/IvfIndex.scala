package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.VectorOps

/** IVF (inverted-file) ANN index pieces: a k-means-trained coarse
  * quantizer plus the assign/probe joins.
  *
  * Training is classic Lloyd iteration in its distributed shape
  * (reference operates per-vector in Python; this is the
  * cluster-scale layout):
  *   - assignment: corpus ⨯ broadcast(centroids) + per-vector argmin —
  *     one scan per iteration, no corpus shuffle;
  *   - update: per-dimension mean via posexplode + two hash
  *     aggregations (map-side partials), producing k new centroids;
  *   - centroids (O(k·dim), independent of corpus size) are collected
  *     to the driver each iteration — the standard k-means
  *     synchronization point (Spark MLlib does the same), which also
  *     resets lineage so iterations don't stack plans.
  *
  * Determinism: init is farthest-point traversal from the min-xxhash
  * vector (no RNG state), iteration count is fixed (no convergence
  * RNG), and ties in assignment break on centroid id — reruns on the
  * same data give the same quantizer up to float-sum ordering in the
  * means.
  */
object IvfIndex {

  /** dist²(v, c) = v·v − 2 v·c + c·c over array<double> columns. */
  private def dist2(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
    VectorOps.dot(v, v) - lit(2.0) * VectorOps.dot(v, c) + VectorOps.dot(c, c)

  /** Assign each row of `df` to its `keep` nearest centroids.
    * Output: (idCol, vecCol, cid), one row per (vector, kept centroid).
    */
  def assign(df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, keep: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist2"), col("cid"))
    df.crossJoin(broadcast(centroids))
      .withColumn("dist2", dist2(col(vecCol), col("cv")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= keep)
      .select(col(idCol), col(vecCol), col("cid"))
  }

  /** Train k centroids with `iters` fixed Lloyd iterations over
    * `vectors` (pass a sample for huge corpora — quantizer quality
    * needs a representative sample, not the full 100 TB).
    * Returns (cid: long, cv: array<double>).
    */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    val centSchema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("cv", ArrayType(DoubleType), nullable = false)))
    def materialize(df: DataFrame): DataFrame = {
      // k·dim doubles — tiny; driver round-trip is the Lloyd sync point
      val rows = df.orderBy(col("cid")).collect()
        .map(r => Row(r.getLong(0), r.getSeq[Double](1)))
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), centSchema)
    }

    // deterministic farthest-point (k-center) init: first centroid =
    // min-xxhash vector, then repeatedly the vector farthest from all
    // chosen so far. One broadcast scan per pick; on well-separated
    // data every cluster gets exactly one seed, which is what keeps
    // Lloyd out of merge/split local optima (a pure hash spread can
    // drop 2+ seeds into one cluster and none into another).
    var cent = materialize(
      vectors.orderBy(xxhash64(col(idCol)), col(idCol)).limit(1)
        .select(lit(0L).as("cid"), col(vecCol).as("cv")))
    for (i <- 1 until k) {
      val next = vectors.crossJoin(broadcast(cent))
        .withColumn("d2", dist2(col(vecCol), col("cv")))
        .groupBy(col(idCol), col(vecCol))
        .agg(min(col("d2")).as("mind2"))
        .orderBy(col("mind2").desc, col(idCol))
        .limit(1)
        .select(lit(i.toLong).as("cid"), col(vecCol).as("cv"))
      cent = materialize(cent.unionByName(next))
    }

    for (_ <- 1 to iters) {
      val assigned = assign(vectors, cent, idCol, vecCol, keep = 1)
      val means = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("mx"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s("mx")).as("mv"))
      // empty clusters keep their previous centroid
      val next = cent.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
      cent = materialize(next)
    }
    cent
  }

  /** Full IVF search: build inverted lists with the given centroids,
    * probe each query's `nprobe` nearest lists, rank candidates by
    * exact cosine, keep top `k`. Output: (qid, rn, nid, cos_sim).
    */
  def search(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    val lists = assign(corpus, centroids, idCol, vecCol, keep = 1)
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("cid"))
    val probes = assign(queries, centroids, idCol, vecCol, keep = nprobe)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    lists.join(broadcast(probes), Seq("cid"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"), col("cos"))
  }
}

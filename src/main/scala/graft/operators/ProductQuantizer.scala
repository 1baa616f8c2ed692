package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.VectorOps

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): vectors split into M
  * subspaces, each with its own small codebook; a vector compresses to
  * M byte-sized codes (here 64 dims → 8 codes ≈ 64× smaller than the
  * doubles), and search scores candidates with an
  * asymmetric-distance-computation (ADC) lookup table — per query, one
  * M×K table of partial dot products replaces every full-vector
  * multiply.
  *
  * Distributed shape: all M codebooks train TOGETHER — sub-vectors are
  * rows keyed by (id, sub), so each Lloyd iteration is one
  * assign-and-mean job for every subspace at once (not M sequential
  * trainings); codebooks are O(M·K·d) and broadcast everywhere. ADC
  * search joins corpus codes to the broadcast per-query LUT on
  * (sub, cid) and sums partials per (query, candidate) — the shuffle
  * carries code rows, never raw vectors. At 100 TB, codes ride inside
  * IVF lists (see SimilarityQueries D8) and this is the in-list
  * scoring; here the corpus is scanned flat.
  *
  * Determinism mirrors IvfIndex: sampled farthest-point init per
  * subspace (min-xxhash head, id tiebreaks), fixed iteration count,
  * assignment ties break on cid.
  */
object ProductQuantizer {

  private val bookSchema = StructType(Seq(
    StructField("sub", LongType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("cv", ArrayType(DoubleType), nullable = false)))

  /** (id, sub, sv) rows: subspace `sub` holds dims [sub·d, (sub+1)·d). */
  def subVectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val d = dim / m
    df.select(col(idCol).as("id"), explode(expr(
      s"transform(sequence(0, ${m - 1}), s -> " +
        s"struct(CAST(s AS BIGINT) AS sub, slice($vecCol, s * $d + 1, $d) AS sv))"))
      .as("e"))
      .select(col("id"), col("e.sub"), col("e.sv"))
  }

  /** Train M codebooks of K centroids each; returns (sub, cid, cv). */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, k: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    val d = dim / m
    def materialize(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), bookSchema)

    // one sample job feeds every subspace's farthest-point init
    val sampleCap = math.max(64 * k, 512)
    val sample: Array[Array[Double]] =
      vectors.orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(sampleCap)
        .select(col(vecCol))
        .collect()
        .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty,
      s"ProductQuantizer.train: input has no vectors in column '$vecCol'")
    require(sample.length >= k,
      s"ProductQuantizer.train: need at least k=$k vectors to seed " +
        s"each codebook, got ${sample.length} — lower k or add data")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val dd = a(i) - b(i); s += dd * dd; i += 1 }
      s
    }
    val init = (0 until m).flatMap { sub =>
      val svs = sample.map(v => java.util.Arrays.copyOfRange(v, sub * d, (sub + 1) * d))
      val chosen = scala.collection.mutable.ArrayBuffer(svs.head)
      val minD2 = svs.map(v => d2(v, svs.head))
      for (_ <- 1 until k) {
        var bi = 0
        var i = 1
        while (i < svs.length) {
          if (minD2(i) > minD2(bi)) bi = i
          i += 1
        }
        chosen += svs(bi)
        var j = 0
        while (j < svs.length) {
          val dd = d2(svs(j), svs(bi))
          if (dd < minD2(j)) minD2(j) = dd
          j += 1
        }
      }
      chosen.zipWithIndex.map { case (v, i) => Row(sub.toLong, i.toLong, v.toSeq) }
    }
    var book = materialize(init)

    val subs = subVectors(vectors, idCol, vecCol, m, dim)
    for (_ <- 1 to iters) {
      val assigned = assignFull(subs, book)
      val means = assigned
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos")).agg(avg(col("x")).as("mx"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s("mx")).as("mv"))
      // empty codes keep their previous centroid; driver round-trip is
      // the Lloyd sync point (M·K·d doubles) and resets lineage
      val next = book.join(means, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
        .orderBy(col("sub"), col("cid")).collect()
        .map(r => Row(r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
      book = materialize(next.toSeq)
    }
    book
  }

  /** Nearest code per (id, sub) with NO shuffle and NO row
    * amplification — the IvfIndex.assignOne treatment applied to the
    * PQ encode: the whole M×K codebook rides along as one broadcast
    * array row and each sub-vector row argmins over its own
    * subspace's entries (filter + transform + array_min; struct
    * ordering IS the (dist², cid) tiebreak the previous window path
    * used, so codes — and the D8/D9 oracles that replay them — are
    * bit-identical). The corpus·K-row broadcast-join + window shuffle
    * per encode/Lloyd iteration disappears.
    */
  private def assignFull(subRows: DataFrame, codebook: DataFrame): DataFrame = {
    val book = codebook
      .agg(collect_list(struct(col("sub"), col("cid"), col("cv"))).as("book"))
    subRows.crossJoin(broadcast(book))
      .withColumn("cid",
        array_min(transform(
          filter(col("book"), c => c("sub") === col("sub")),
          c => struct(
            (VectorOps.dot(col("sv"), col("sv")) -
              lit(2.0) * VectorOps.dot(col("sv"), c("cv")) +
              VectorOps.dot(c("cv"), c("cv"))).as("d2"),
            c("cid").as("cid"))))("cid"))
      .select(col("id"), col("sub"), col("sv"), col("cid"))
  }

  /** Nearest code per (id, sub): the PQ encoding. Input must be
    * sub-vector rows from [[subVectors]]; output (id, sub, cid).
    */
  def assignCodes(subRows: DataFrame, codebook: DataFrame): DataFrame =
    assignFull(subRows, codebook).select(col("id"), col("sub"), col("cid"))

  /** ADC top-`pool` per query by approximate cosine against coded
    * candidates. corpusCodes: (id, sub, cid) from [[assignCodes]];
    * queries: (idCol, vecCol). Output (qid, nid, approx_cos).
    *
    * approx cos(q, x) = Σ_sub dot(q_sub, c_sub(x)) /
    *                    (|q| · sqrt(Σ_sub |c_sub(x)|²)).
    */
  def adcTopPool(corpusCodes: DataFrame, codebook: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, pool: Int): DataFrame = {
    val qsubs = subVectors(queries, idCol, vecCol, m, dim)
      .select(col("id").as("qid"), col("sub"), col("sv").as("qsv"))
    val qnorm = queries.select(col(idCol).as("qid"),
      VectorOps.norm(col(vecCol)).as("qn"))
    // the per-query LUT: one partial dot + code norm per (qid, sub, cid)
    val lut = qsubs.join(broadcast(codebook), Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"),
        VectorOps.dot(col("qsv"), col("cv")).as("dotp"),
        VectorOps.dot(col("cv"), col("cv")).as("cn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_cos").desc, col("nid"))
    corpusCodes.select(col("id").as("nid"), col("sub"), col("cid"))
      .join(broadcast(lut), Seq("sub", "cid"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("dotp")).as("adot"), sum(col("cn2")).as("an2"))
      .join(broadcast(qnorm), Seq("qid"))
      .withColumn("approx_cos", col("adot") / (col("qn") * sqrt(col("an2"))))
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") <= pool)
      .select(col("qid"), col("nid"), col("approx_cos"))
  }
}

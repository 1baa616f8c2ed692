package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.VectorOps

/** Multi-table random-hyperplane (sign) LSH over `array<double>`
  * embedding columns — the corpus-wide candidate generator behind
  * embedding near-dup detection and approximate kNN.
  *
  * Hyperplane family: component `w(p, d)` of plane `p` is the
  * integer-valued double `((1103·(p·dim+d) + 12289) mod 8191) − 4095`.
  * Integer arithmetic keeps every component exactly representable, so
  * DuckDB replays the same planes from the same formula and the
  * sign-of-dot-product agrees bit-for-bit with the codegen'd
  * [[graft.functions.DotProductExpr]] (same sequential fold as
  * `list_dot_product` — proven for MinHash/SimHash in round 1).
  *
  * Bucketing: `tables` independent hash tables, each keyed by a
  * `bits`-bit integer whose j-th bit is `dot(v, plane(t·bits+j)) ≥ 0`.
  * For vectors at angle θ, a single bit agrees with probability
  * `1 − θ/π`, a table collides with `(1 − θ/π)^bits`, and any-table
  * recall is `1 − (1 − (1−θ/π)^bits)^tables` — near-dup pairs
  * (cos ≥ 0.95, θ ≤ 0.1π) collide in ≥1 of 8×8-bit tables with
  * p ≈ 0.99.
  *
  * Scale shape: candidate generation is an equi-join on
  * `(table, bucket)` — no all-pairs product anywhere. Expected bucket
  * occupancy is `n / 2^bits` per table; at larger corpora raise
  * `bits` (and `tables` to hold recall). Pair verification re-joins
  * ids to vectors — two keyed shuffles — rather than carrying vector
  * payloads through the distinct.
  */
object RandomHyperplaneLsh {

  /** Plane `p` as an integer-valued double array (see formula above). */
  def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => (((1103L * (p.toLong * dim + d) + 12289L) % 8191L) - 4095L).toDouble)

  /** The `bits`-bit sign bucket of `v` in table `tbl` (long column). */
  def bucket(v: Column, tbl: Int, bits: Int, dim: Int): Column =
    (0 until bits).map { j =>
      when(VectorOps.dot(v, typedlit(hyperplane(tbl * bits + j, dim))) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One row per (input row × table): `idCol`, vecCol as `v`, `tbl`,
    * `bucket`. The equi-join surface for candidate generation.
    */
  def bucketed(e: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, dim: Int): DataFrame = {
    val tb = (0 until tables).map { t =>
      struct(lit(t).as("tbl"), bucket(col(vecCol), t, bits, dim).as("bucket"))
    }
    e.select(col(idCol), col(vecCol).as("v"),
        explode(array(tb: _*)).as("tb"))
      .select(col(idCol), col("v"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** Distinct unordered candidate pairs (`id_a < id_b`) that share at
    * least one (table, bucket), with the LOWER id inside the bucket's
    * `bucketCap`-lowest-id pool. Uncapped, per-bucket pair volume is
    * |bucket|² — the r8 sf10 probe OOM'd a single join task on the
    * 2M-row corpus, where jittered near-copies co-bucket en masse;
    * capped, worst-case volume is n·tables·bucketCap regardless of
    * skew (the knnGraph contract applied to pair generation). The
    * rank is deterministic (row_number by id) and SQL-replayable, so
    * oracles mirror the same pool filter; it never binds at test SFs.
    * A pair (a < b) survives iff a ranks ≤ cap in some shared bucket —
    * within one bucket b ∈ pool ⇒ a ∈ pool, so pooling only the
    * lower side loses nothing.
    */
  def candidatePairs(e: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, dim: Int, bucketCap: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bk = bucketed(e, idCol, vecCol, tables, bits, dim)
      .select(col("tbl"), col("bucket"), col(idCol))
    val wB = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(idCol))
    val pool = bk.withColumn("prn", row_number().over(wB))
      .filter(col("prn") <= bucketCap)
      .select(col("tbl"), col("bucket"), col(idCol).as("id_a"))
    pool.join(bk.select(col("tbl"), col("bucket"), col(idCol).as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Corpus-wide near-duplicate pairs: LSH candidates verified by
    * exact cosine ≥ `threshold` (4-dp rounded). Output
    * `(id_a, id_b, cos_sim)` ordered by ids.
    *
    * Verification runs INSIDE the bucket join — both sides carry
    * their vector through the (tbl, bucket) shuffle (n·tables rows,
    * ~0.5 KB each) and every candidate's cosine + threshold test
    * evaluates in the join task, so candidate pairs are never
    * materialized beyond the stream. The distinct (a pair can collide
    * in several tables; identical inputs give bit-identical cosines)
    * sees only THRESHOLD-PASSING rows. The alternative — distinct the
    * id pairs first, then attach vectors by two keyed joins — re-sorts
    * the full candidate set with a 0.5 KB payload glued on: the r8
    * sf10 probe filled the DISK spilling ~200 GB of exactly that sort
    * before dying. Duplicate cross-table cosine evaluations are the
    * price, bounded by bucketCap·tables per row — cheap codegen'd
    * arithmetic against a join that needs no giant sort anywhere.
    */
  def nearDupPairs(e: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 8, bits: Int = 8, dim: Int = 64,
      bucketCap: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bk = bucketed(e, idCol, vecCol, tables, bits, dim)
    val wB = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(idCol))
    val pool = bk.withColumn("prn", row_number().over(wB))
      .filter(col("prn") <= bucketCap)
      .select(col("tbl"), col("bucket"), col(idCol).as("id_a"),
        col("v").as("va"))
    val probe = bk.select(col("tbl"), col("bucket"), col(idCol).as("id_b"),
      col("v").as("vb"))
    pool.join(probe, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(VectorOps.dot(col("va"), col("vb")) /
          (sqrt(VectorOps.dot(col("va"), col("va"))) *
            sqrt(VectorOps.dot(col("vb"), col("vb")))), 4) + lit(0.0))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .distinct()
      .transform(df => graft.QueryShape.stagedSort(df, col("id_a"), col("id_b")))
  }

  /** Approximate top-`k` cosine neighbors for a (small, broadcast)
    * query set: candidates are bucket-mates in any table, ranked by
    * exact cosine. Output `(qid, rn, nid, cos_sim)`.
    */
  def knn(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 8, bits: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = bucketed(corpus, idCol, vecCol, tables, bits, dim)
      .select(col("tbl"), col("bucket"), col(idCol).as("nid"), col("v").as("nv"))
    val qb = bucketed(queries, idCol, vecCol, tables, bits, dim)
      .select(col("tbl"), col("bucket"), col(idCol).as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("qv"), col("nid"), col("nv")).distinct()
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"),
        (round(col("cos"), 4) + lit(0.0)).as("cos_sim"))
      .transform(df => graft.QueryShape.stagedSort(df, col("qid"), col("rn")))
  }

  /** All-pairs k-NN GRAPH over one corpus: same bucket-candidate
    * generation as [[knn]], but the bucket join is a plain SHUFFLE
    * equi-join — when the "query" side is the whole corpus there is
    * nothing small to broadcast, and bucket co-residency (not n²)
    * still bounds the candidate volume. Returns every node's top-k
    * directed edges (qid, rn, nid, cos_sim).
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 8, bits: Int = 8, dim: Int = 64,
      bucketCap: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ID-ONLY candidate join (the module's own scale rule, re-learned
    // by the r8 sf1 probe: the previous shape carried both 64-dim
    // vector payloads through the bucket join AND the distinct —
    // ~60× the bytes of an id pair — and one hot bucket spilled 19 GB
    // from a single task on the native-cardinality 200k corpus, where
    // jittered near-copies co-bucket but don't digest-collapse. With
    // ids only, the same candidate volume is two longs per row, and
    // vectors attach AFTER the distinct via two keyed joins — exactly
    // the candidatePairs/nearDupPairs shape that measured 15.7 s at
    // sf1.)
    //
    // BOUNDED candidate pool per bucket: each node compares against at
    // most the `bucketCap` lowest-id members of each of its buckets
    // (deterministic, SQL-replayable rank). Without the cap, per-bucket
    // work is |bucket|² — a single pathological bucket (boilerplate
    // vectors, a mass near-dup family) owns one task and the whole
    // stage at 100 TB; with it, worst-case candidate volume is
    // n·tables·bucketCap — a hard bound independent of skew. Top-k
    // quality is unaffected where buckets are smaller than the cap
    // (every test SF), and inside a capped hot bucket the pool members
    // are mutually near by LSH construction, so ranked top-k remains a
    // faithful ANN answer. The oracle mirrors the same rank filter.
    val b = bucketed(corpus, idCol, vecCol, tables, bits, dim)
    val ids = b.select(col("tbl"), col("bucket"), col(idCol))
    val wB = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(idCol))
    val pool = ids.withColumn("prn", row_number().over(wB))
      .filter(col("prn") <= bucketCap)
      .select(col("tbl"), col("bucket"), col(idCol).as("nid"))
    val cand = ids.select(col("tbl"), col("bucket"), col(idCol).as("qid"))
      .join(pool, Seq("tbl", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid")).distinct()
    // Vectors ride the two attach joins as FLOATS: the corpus embeddings
    // are float-origin, so double→float→double is value-exact and the
    // cosine (computed in double after the cast-back) is bit-identical —
    // but the candidate-pair shuffle, the dominant byte volume of the
    // whole build (|pairs| ≈ n·tables·cap rows), carries 256 B per vector
    // instead of 512 B.
    // Norms are precomputed ONCE per node (8 bytes alongside the float
    // vector) instead of per pair — cosine as dot/(nq·nn) runs one dot
    // product per candidate instead of three. Same norm expression on the
    // same input ⇒ bit-identical cosine values.
    val vecs = corpus.select(col(idCol),
      col(vecCol).cast("array<float>").as("vf"),
      VectorOps.norm(col(vecCol)).as("nrm"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cand
      .join(vecs.select(col(idCol).as("qid"), col("vf").as("qv"),
        col("nrm").as("qn")), Seq("qid"))
      .join(vecs.select(col(idCol).as("nid"), col("vf").as("nv"),
        col("nrm").as("nn")), Seq("nid"))
      .withColumn("cos", VectorOps.dot(col("qv").cast("array<double>"),
        col("nv").cast("array<double>")) / (col("qn") * col("nn")))
      .select(col("qid"), col("nid"), col("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"),
        (round(col("cos"), 4) + lit(0.0)).as("cos_sim"))
  }
}

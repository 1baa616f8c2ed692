package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.VectorOps

/** HNSW-lite: a layered-pivot beam search — the navigable-hierarchy
  * idea of HNSW (Malkov & Yashunin 2016) re-expressed in joins instead
  * of a sequentially-built graph (greedy graph insertion is inherently
  * one-at-a-time; a hierarchy of pivot layers with beam descent keeps
  * the logarithmic-ish search structure while building in two
  * shuffle-free assignment passes).
  *
  * Layers: L1 = the ceil(n/fanout) lowest-xxhash corpus nodes, L2 = the
  * ceil(n/fanout²) lowest of those — nested like HNSW levels (a level-2
  * node is in every lower level), deterministic (hash order, id
  * tiebreak), no RNG state. Every L1 node points to its nearest L2
  * pivot and every corpus node to its nearest L1 pivot — both via
  * IvfIndex.assignOne (broadcast-argmin, no shuffle, no row
  * amplification).
  *
  * Search descends with a beam: score ALL L2 pivots exactly (tiny,
  * broadcast), keep beamTop; expand to L1 nodes under those pivots
  * (equi-join on parent), keep beamMid; expand to corpus nodes under
  * THOSE (equi-join), exact-cosine re-rank, top k. Per query the
  * candidate volume is ~beamMid·fanout bottom-layer nodes — the
  * fraction-of-corpus-touched contract HnswLiteSpec asserts.
  *
  * At 100 TB: layers are corpus-fraction tables (build = two argmin
  * passes over one scan each), search is two broadcast equi-joins —
  * the same scale shape as the IVF tier with one more level of
  * indirection, which is what keeps the TOP of the hierarchy small
  * enough to broadcast no matter how big the corpus gets.
  */
object HnswLite {

  /** (qid, rn, nid, cos) top-k by beam-searched exact cosine. */
  def search(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      fanout: Int = 16, beamTop: Int = 4, beamMid: Int = 8): DataFrame = {
    val n = corpus.count()
    def ceilDiv(a: Long, b: Long) = ((a + b - 1) / b).toInt
    // nested deterministic levels: the hash order is the "level draw"
    val l1 = corpus.orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(math.max(ceilDiv(n, fanout), 1))
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .localCheckpoint(eager = true) // reused as centroids AND as nodes
    val l2 = l1.orderBy(xxhash64(col("cid")), col("cid"))
      .limit(math.max(ceilDiv(n, fanout.toLong * fanout), 1))
      .localCheckpoint(eager = true)

    // graph edges: child -> nearest upper-level pivot (shuffle-free)
    val l1Edges = IvfIndex.assignOne(
        l1.select(col("cid").as("l1id"), col("cv").as("l1v")), l2, "l1id", "l1v")
      .select(col("l1id"), col("l1v"), col("cid").as("parent2"))
    val corpusEdges = IvfIndex.assignOne(corpus, l1, idCol, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("cid").as("parent1"))

    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    // level 2: score every pivot (tiny) — the hierarchy's entry points
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val beam2 = q.crossJoin(broadcast(l2))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= beamTop)
      .select(col("qid"), col("qv"), col("cid").as("parent2"))
    // level 1: expand the beam through the L2->L1 edges
    val wMid = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("l1id"))
    val beam1 = broadcast(beam2).join(l1Edges, Seq("parent2"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("l1v")))
      .withColumn("rk", row_number().over(wMid))
      .filter(col("rk") <= beamMid)
      .select(col("qid"), col("qv"), col("l1id").as("parent1"))
    // bottom: expand to corpus nodes under the beam, exact re-rank
    val wK = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    broadcast(beam1).join(corpusEdges, Seq("parent1"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(wK).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"), col("cos"))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the r10 driver-side MMR greedy (SimilarityQueries.mmrGreedy)
  * to the r9 per-round DataFrame formula it replaced — same pool, the
  * selection (qid, nid, rank, rel) must be IDENTICAL, rel bit-equal.
  * The pool plants exact relevance ties (duplicate vectors) so the
  * nid tie-break path is exercised, and a 1-candidate query so the
  * short-pool round exits match.
  */
class MmrSelectSpec extends SparkSpec {
  import spark.implicits._

  /** The r9 distributed greedy, verbatim: per-round window argmax over
    * 0.7·rel − 0.3·max-sim-to-selected with the nid tie-break.
    */
  private def referenceSelect(pool0: DataFrame, rounds: Int): DataFrame = {
    val pool = pool0.localCheckpoint(eager = true)
    val pairs = pool.select(col("qid"), col("nid").as("a"), col("nv").as("av"))
      .join(pool.select(col("qid"), col("nid").as("b"), col("nv").as("bv")), Seq("qid"))
      .filter(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        VectorOps.cosine(col("av"), col("bv")).as("sim"))
      .localCheckpoint(eager = true)
    val wPick = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
    var selected = pool
      .withColumn("score", col("rel"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("qid"), col("nid"), lit(1L).as("rank"), col("rel"))
    for (r <- 2 to rounds) {
      val penalty = pairs
        .join(selected.select(col("qid"), col("nid").as("b")), Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("nid"))
        .agg(max(col("sim")).as("pen"))
      val pick = pool
        .join(selected.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_anti")
        .join(penalty, Seq("qid", "nid"))
        .withColumn("score", lit(0.7) * col("rel") - lit(0.3) * col("pen"))
        .withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("qid"), col("nid"), lit(r.toLong).as("rank"), col("rel"))
      selected = selected.unionByName(pick).localCheckpoint(eager = true)
    }
    selected
  }

  /** Deterministic pool: 3 queries × 10 candidates of 8-dim integer
    * lattice vectors (exact doubles), PLUS a planted exact tie — two
    * candidates sharing one vector (same rel, same sims; the greedy
    * must take the lower nid first) — plus a 1-candidate query whose
    * rounds 2+ pick nothing.
    */
  private def pool(): DataFrame = {
    val rows = (for {
      q <- 0L to 2L
      c <- 0L until 10L
    } yield {
      val nid = 100 * q + c
      val base = if (c >= 8) 7L else c // nids q*100+8/9 duplicate c=7's vector
      val v = Array.tabulate(8)(d => ((1103 * (base * 8 + d) + 7 * q) % 17 - 8).toDouble)
      val qv = Array.tabulate(8)(d => ((2971 * (q * 8 + d) + 331) % 13 - 6).toDouble)
      def dot(a: Array[Double], b: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val rel = dot(qv, v) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v)))
      (q, nid, v.toSeq, rel)
    }) :+ ((9L, 900L, Array.tabulate(8)(_.toDouble + 1).toSeq, 0.5))
    rows.toDF("qid", "nid", "nv", "rel")
  }

  test("driver greedy == r9 per-round DataFrame greedy, ties and short pools included") {
    val p = pool()
    val want = referenceSelect(p, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val got = SimilarityQueries.mmrGreedy(
      p.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getDouble(3))).toSeq,
      rounds = 5)
      .sortBy(t => (t._1, t._3))
    assert(got == want)
    // the planted duplicate-vector tie actually fired: both clones of
    // c=7's vector appear somewhere in query 0's selection order only
    // if the tie-break picked deterministically; require the earliest
    // duplicate nid to precede the later one whenever both are chosen
    val q0 = got.filter(_._1 == 0L).sortBy(_._3).map(_._2)
    val (i8, i9) = (q0.indexOf(8L), q0.indexOf(9L))
    if (i8 >= 0 && i9 >= 0) assert(i8 < i9)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.HnswLite

/** The HNSW-lite recall-vs-beam-width curve, recorded like the IVF
  * recall curve (LshRecallSpec / IvfSpec pattern): widening the
  * mid-level beam grows the bottom-layer candidate set, so recall@5
  * against exact brute force must climb (within a float-tie
  * tolerance) and reach the production floor at the default width.
  * The curve is the number a beam-width knob is FOR — it is what a
  * user consults when trading candidate volume for recall at 100 TB.
  */
class HnswSweepSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16

  test("recall@5 climbs with beamMid and hits the floor at the default width") {
    val n = 50000L
    // 64 planted clusters — enough that a 1-wide mid beam can land in
    // the wrong branch of the hierarchy (8 clusters saturate every
    // width at 1.00 and the curve shows nothing)
    val e = spark.range(n).select(col("id").as("vec_id"), expr(
      s"""transform(sequence(0, ${dim - 1}), d ->
         | CAST((1103 * ((id % 64) * $dim + d) + 12289) % 8191 - 4095 AS DOUBLE) / 819.1D
         | + CAST((2971 * (id * $dim + d) + 331) % 997 - 498 AS DOUBLE) / 9970.0D
         |)""".stripMargin).as("v"))
      .localCheckpoint(true)
    val queries = e.filter(col("vec_id") < 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(
        queries.select(col("vec_id").as("qid"), col("v").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"))
      .as[(Long, Long)].collect().toSet

    val widths = Seq(1, 2, 4, 8, 16)
    val curve = widths.map { bm =>
      val got = HnswLite.search(e, queries, "vec_id", "v", k = 5, beamMid = bm)
        .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
      bm -> (got intersect exact).size.toDouble / exact.size
    }
    info(curve.map { case (bm, r) => f"beamMid=$bm%2d -> recall $r%.2f" }
      .mkString(", "))
    // wider beam = superset candidate pool at the bottom layer; recall
    // may wobble only through mid-level tie rearrangement, never drop
    // materially
    curve.sliding(2).foreach { case Seq((bmA, rA), (bmB, rB)) =>
      assert(rB >= rA - 0.05,
        f"recall fell $rA%.2f -> $rB%.2f widening beamMid $bmA -> $bmB")
    }
    val atDefault = curve.find(_._1 == 8).get._2
    assert(atDefault >= 0.8,
      f"recall@5 $atDefault%.2f at the default beamMid=8 below the 0.8 floor")
  }
}

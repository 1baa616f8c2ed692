package graft

import org.apache.spark.sql.functions._
import graft.operators.RandomHyperplaneLsh

/** Behavior proof for the random-hyperplane LSH tier: planted
  * near-dup pairs are found corpus-wide (no id-distance assumption),
  * and approximate kNN recalls the true neighbors on clustered data.
  * Deterministic seeded data — no Math.random.
  */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** xorshift-ish deterministic pseudo-random double in [-1, 1). */
  private def prand(seed: Long): Double = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    x ^= x >>> 33; x *= -49064778989728563L; x ^= x >>> 33
    (x >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  private def randVec(seed: Long): Array[Double] =
    Array.tabulate(dim)(d => prand(seed * 131 + d))

  /** `base` plus tiny deterministic noise — cosine ≥ 0.99. */
  private def nearDup(base: Array[Double], seed: Long): Array[Double] =
    base.zipWithIndex.map { case (v, d) => v + 0.02 * prand(seed * 977 + d) }

  test("planted near-dup pairs are found at arbitrary id distance") {
    // 400 random docs + 5 planted dup pairs spanning the id range
    val dups = Seq((1L, 390L), (7L, 201L), (55L, 388L), (102L, 333L), (150L, 399L))
    val bases = dups.map { case (a, b) => (a, b, randVec(a + 5000)) }
    val rows =
      (0L until 400L).map { i =>
        bases.collectFirst { case (_, b, v) if b == i => (i, nearDup(v, i)) }
          .getOrElse((i, bases.collectFirst { case (a, _, v) if a == i => v }
            .getOrElse(randVec(i))))
      }
    val e = rows.toDF("vec_id", "v")
    val found = RandomHyperplaneLsh
      .nearDupPairs(e, "vec_id", "v", threshold = 0.9, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    dups.foreach { p =>
      assert(found.contains(p), s"planted pair $p not recovered (found: $found)")
    }
    // and nothing else crosses 0.9 on random data
    assert(found == dups.toSet)
  }

  test("knn recall@5 >= 0.8 vs bruteforce on planted clusters") {
    // 20 clusters × 10 members: member = center + noise (in-cluster
    // cosine ≈ 0.97+, cross-cluster ≈ 0) — true top-5 are in-cluster
    val rows = for {
      c <- 0 until 20
      m <- 0 until 10
    } yield {
      val id = (c * 10 + m).toLong
      val center = randVec(c + 9000L)
      (id, if (m == 0) center else nearDup(center, id + 70000L))
    }
    val e = rows.toDF("vec_id", "v")
    val q = e.filter(col("vec_id") % 10 === 0) // one query per cluster

    val approx = RandomHyperplaneLsh.knn(e, q, "vec_id", "v", k = 5, dim = dim)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact top-5 via brute force on the same frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
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
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 $mean < 0.8 (per-query: $recalls)")
  }

  test("canonical-table emission == naive distinct pool join (and truly duplicate-free)") {
    // The r10 packed-pool rewrite emits each pair exactly once (at its
    // first shared-pooled table) instead of distinct-ing the 8-table
    // fan-out. This pins the equivalence against a naive reference
    // built from the same primitives: bucket codes via
    // HyperplaneBucketsExpr, pool = lowest-cap ids per (tbl, bucket),
    // pair survives iff some shared bucket pools its lower id. A tiny
    // cap (4) on a clustered corpus forces the cap to BIND, so the
    // poolmask logic is exercised where membership differs per table.
    val rows = for { c <- 0 until 10; m <- 0 until 40 } yield {
      val id = (c * 40 + m).toLong
      val center = randVec(c + 7000L)
      (id, if (m == 0) center else nearDup(center, id + 90000L))
    }
    val e = rows.toDF("vec_id", "v")
    val (tables, bits, cap, thr) = (8, 8, 4, 0.2)

    val got = RandomHyperplaneLsh
      .nearDupPairs(e, "vec_id", "v", threshold = thr, tables = tables,
        bits = bits, dim = dim, bucketCap = cap)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // duplicate-free by construction — canonical emission's whole point
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length,
      "canonical emission produced duplicate pairs")

    // naive reference: explode all tables, pool by rank, join, distinct
    import org.apache.spark.sql.expressions.Window
    val codes = org.apache.spark.sql.GraftBridge.column(
      graft.functions.HyperplaneBucketsExpr(
        org.apache.spark.sql.GraftBridge.expression(col("v")),
        tables, bits, dim))
    val bk = e.select(col("vec_id"), col("v"),
      posexplode(codes).as(Seq("tbl", "bucket")))
    val wB = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col("vec_id"))
    val pool = bk.withColumn("prn", row_number().over(wB))
      .filter(col("prn") <= cap)
      .select(col("tbl"), col("bucket"), col("vec_id").as("id_a"),
        col("v").as("va"))
    val want = pool.join(bk.select(col("tbl"), col("bucket"),
        col("vec_id").as("id_b"), col("v").as("vb")), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        (round(VectorOps.cosine(col("va"), col("vb")), 4) + lit(0.0)))
      .filter(col("cos_sim") >= thr)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(want.nonEmpty, "fixture produced no pairs — the test is vacuous")
    assert(got.toSet == want.toSet,
      s"canonical emission diverged from the naive distinct pool join: " +
        s"only-got=${(got.toSet -- want.toSet).take(5)} " +
        s"only-want=${(want.toSet -- got.toSet).take(5)}")
  }
}

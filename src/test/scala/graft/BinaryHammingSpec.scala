package graft

import org.apache.spark.sql.functions._

/** D18 `knn_binary_hamming` — binary quantization keeps sign-coherent
  * neighbors: plant 10 clusters whose members share an exact 64-dim
  * sign pattern (magnitudes vary, signs never flip), so cluster mates
  * quantize to IDENTICAL two-word codes (Hamming 0) while cross-cluster
  * codes differ in many bits. Every query's top-5 must be mates, at
  * Hamming 0, ranked by exact cosine.
  */
class BinaryHammingSpec extends SparkSpec {

  import spark.implicits._

  test("sign-coherent cluster mates are retrieved at Hamming 0") {
    val dir = TmpDir.scratch("binham_emb")
    // ids 1..80; cluster c = (id-1) % 10; sign s_c[d] deterministic in
    // (c, d); magnitude varies per (id, d) without crossing zero.
    val rows = (1 to 80).map { id =>
      val c = (id - 1) % 10
      // multiplicative mix — an ADDITIVE c/d hash mod small m is
      // degenerate (pattern depends only on c+d, making clusters c and
      // c+m sign-identical); this one has min cross-cluster Hamming 17
      val v = (0 until 64).map { d =>
        val sign = if (((c + 1L) * (d + 7L) * 2654435761L) % 97 < 48) -1.0 else 1.0
        sign * (1.0 + 0.01 * ((id * 13 + d) % 7))
      }.toArray
      (id.toLong, s"c$c", v)
    }
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("knn_binary_hamming")(spark, dir).collect()
    assert(out.length == 10 * 5)
    out.foreach { r =>
      val (qid, nid) = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert((nid - 1) % 10 == (qid - 1) % 10,
        s"qid=$qid got non-mate nid=$nid")
      assert(r.getAs[Long]("ham") == 0L, s"qid=$qid nid=$nid ham != 0")
      assert(r.getAs[Double]("cos_sim") > 0.999)
    }
  }
}

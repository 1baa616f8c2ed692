package graft

import org.apache.spark.sql.functions._

/** Content-defined chunking (C16): the property that justifies CDC
  * over fixed-size chunking is INSERTION ROBUSTNESS — boundaries
  * follow content, so an edit near the start re-syncs every boundary
  * downstream and shared tails still dedup. The oracle gate proves
  * engine equality; this proves the property.
  */
class CdcSpec extends SparkSpec {

  /** Deterministic pseudo-random a-z/space text (LCG). */
  private def lcgText(n: Int, seed: Long): String = {
    val sb = new StringBuilder(n)
    var s = seed
    (0 until n).foreach { _ =>
      s = (s * 6364136223846793005L + 1442695040888963407L)
      val r = ((s >>> 33) % 27).toInt
      sb.append(if (r == 26) ' ' else ('a' + r).toChar)
    }
    sb.toString
  }

  test("CdcCutsExpr: sentinels, monotonicity, and the empty text") {
    val e = graft.functions.CdcCutsExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8, 64)
    assert(e.cuts("").toSeq == Seq(0, 0))
    val t = lcgText(4096, 7L)
    val cuts = e.cuts(t)
    assert(cuts.head == 0 && cuts.last == t.length)
    assert(cuts.sliding(2).forall(p => p(0) < p(1)), "cuts must strictly increase")
    // expected chunk length ~ modulus: loose 3x band on 4096 chars
    val mean = t.length.toDouble / (cuts.length - 1)
    assert(mean > 64.0 / 3 && mean < 64.0 * 3, s"mean chunk $mean far from 64")
  }

  test("dedup_cdc_chunks: a prefix insertion preserves most chunk digests") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val a = lcgText(4000, 42L)
    val b = "thirteen char " + a // insertion at the head
    Seq((1L, a, "en"), (2L, b, "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("dedup_cdc_chunks")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"))).toMap
    val (nA, dupA) = out(1L)
    val (nB, dupB) = out(2L)
    // content-defined boundaries re-sync after the edit: > 80% of A's
    // chunks reappear verbatim in B
    assert(dupA * 5 >= nA * 4,
      s"CDC must re-sync after an insertion: $dupA of $nA chunks shared")
    assert(dupB >= dupA, "every shared chunk is dup on both sides")
    // the contrast that motivates CDC: FIXED-size 64-char chunks of
    // the same pair share (almost) nothing — the insertion shifts
    // every later boundary
    def fixedDigests(t: String): Set[String] =
      t.grouped(64).map(c => java.security.MessageDigest.getInstance("MD5")
        .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString).toSet
    val shared = fixedDigests(a).intersect(fixedDigests(b)).size
    assert(shared <= 1,
      s"fixed-size chunking should lose alignment after an insertion, shared=$shared")
  }
}

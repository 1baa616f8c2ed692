package graft

import org.apache.spark.sql.functions._

/** C13 `dedup_substring` — exact duplicated-substring spans (the
  * ExactSubstr contract of Lee et al. 2021): hand-planted corpora with
  * known duplicated runs, dup-token accounting verified to the token.
  *
  * The algebra under test: a >=L-token span is duplicated iff every
  * L-window inside it is duplicated; fixed-length intervals merge by
  * gaps-and-islands with a new island iff p - lag(p) > L; each island
  * covers max(p) - min(p) + L tokens.
  */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Boolean)] = {
    val dir = TmpDir.scratch("substr_docs")
    docs.toDF("doc_id", "text")
      .withColumn("source", lit("spec"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("dedup_substring")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens"),
          r.getAs[Boolean]("keep"))))
      .toMap
  }

  test("cross-doc shared 10-token run covers exactly 10 tokens per doc") {
    // A: 5 unique + S1..S10 + 5 unique; B: same S run, different unique
    // flanks. Fully-inside-S 8-windows start at positions 6..8 only
    // (straddling windows contain doc-unique tokens), so the island is
    // [6, 8] covering 8 - 6 + 8 = 10 tokens - the S run, exactly.
    val s = (1 to 10).map(i => s"s$i").mkString(" ")
    val a = ((1 to 5).map(i => s"ua$i") ++ Seq(s) ++ (6 to 10).map(i => s"ua$i")).mkString(" ")
    val b = ((1 to 5).map(i => s"vb$i") ++ Seq(s) ++ (6 to 10).map(i => s"vb$i")).mkString(" ")
    val out = run(Seq(1L -> a, 2L -> b))
    assert(out(1L) == ((20L, 10L, true)))
    assert(out(2L) == ((20L, 10L, true)))
  }

  test("within-doc repeat forms two islands with the separator uncovered") {
    // C: w1 R1..R8 w2 R1..R8 w3 - the R window occurs at p=2 and p=11
    // (count 2 in the corpus, same doc), islands [2..9] and [11..18]
    // cover 16 of 19 tokens; w1/w2/w3 stay uncovered. 16/19 > 0.5 so
    // the doc is dropped.
    val r = (1 to 8).map(i => s"r$i").mkString(" ")
    val c = s"w1 $r w2 $r w3"
    val d = (1 to 12).map(i => s"qq$i").mkString(" ") // no dups
    val e = "t1 t2 t3"                                // shorter than L
    val out = run(Seq(3L -> c, 4L -> d, 5L -> e))
    assert(out(3L) == ((19L, 16L, false)))
    assert(out(4L) == ((12L, 0L, true)))
    assert(out(5L) == ((3L, 0L, true)))
  }

  test("adjacent duplicated windows merge into one hole-free island") {
    // Two docs sharing their ENTIRE 12-token text: every 8-window
    // (starts 1..5) is duplicated, one island covering all 12 tokens.
    val t = (1 to 12).map(i => s"z$i").mkString(" ")
    val out = run(Seq(6L -> t, 7L -> t))
    assert(out(6L) == ((12L, 12L, false)))
    assert(out(7L) == ((12L, 12L, false)))
  }
}

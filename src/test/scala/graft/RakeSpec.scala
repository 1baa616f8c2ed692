package graft

/** RAKE extraction on planted corpora: known phrase structure in,
  * known top keyword out — the deg/freq scoring and the island
  * segmentation both have teeth here (a tokenizer that split on the
  * wrong boundary or a deg that double-counted would crown the wrong
  * phrase).
  */
class RakeSpec extends SparkSpec {

  import spark.implicits._

  private def top(text: String): (String, Long, Long) = {
    val out = TextQueries.rakeFor(Seq((1L, text)).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    (r.getAs[String]("top_phrase"), r.getAs[Long]("score_scaled"),
      r.getAs[Long]("n_candidates"))
  }

  test("repeated multi-word phrase beats scattered singles") {
    // "deep neural network" appears twice as a full run; filler words
    // appear once each — the co-occurrence degree must crown the run
    val (phrase, _, _) = top(
      "deep neural network is great and deep neural network is fast " +
        "for tiny budget")
    assert(phrase == "deep neural network")
  }

  test("phrase runs break at stopwords, not mid-run") {
    // "red apple pie" is one island; "red" also occurs alone — deg(red)
    // accumulates both, but the 3-word island must still outrank it
    val (phrase, _, n) = top("red apple pie is red apple pie of red")
    assert(phrase == "red apple pie")
    assert(n >= 2) // the lone 'red' island is a separate candidate
  }

  test("all-stopword text yields no candidates") {
    val out = TextQueries.rakeFor(
      Seq((1L, "the of and to in is it")).toDF("doc_id", "text")).collect()
    assert(out.isEmpty)
  }

  test("deg/freq: a word shared by long runs outscores an isolated word") {
    // 'alpha' rides two 2-word runs (deg 4, freq 2 → 2.0/occurrence);
    // 'omega' stands alone (deg 1, freq 1 → 1.0)
    val (phrase, score, _) = top("alpha beta is alpha gamma for omega")
    assert(Set("alpha beta", "alpha gamma").contains(phrase))
    // island score = wscore(alpha) + wscore(beta|gamma) = 20000 + 20000
    assert(score == 40000L)
  }

  test("native pass == window pipeline on an adversarial corpus") {
    val docs = Seq(
      (1L, "deep neural network is great and deep neural network is fast"),
      (2L, "red apple pie is red apple pie of red"),
      (3L, "the of and to in is it"),                   // no candidates
      (4L, ""),                                          // empty
      (5L, "alpha beta is alpha gamma for omega"),
      (6L, "  Mixed   CASE tokens,, with;; punctuation!! runs  "),
      (7L, "a1 b2 c3 of a1 b2 for c3 a1"),              // digits + ties
      (8L, "tie tie of tie tie"),                        // equal-score islands
      (9L, "x " * 200 + "y")                             // long doc
    ).toDF("doc_id", "text")
    val native = TextQueries.rakeFor(docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val windowed = TextQueries.rakeWindowedFor(docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(native == windowed)
  }
}

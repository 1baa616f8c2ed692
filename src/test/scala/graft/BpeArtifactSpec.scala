package graft

import graft.operators.BpeTrainer.Artifacts

/** The tokenizer-artifact contract behind text_bpe_artifact (E16):
  * training runs at most once per (corpus, rounds) per session, every
  * later execution of the query is encode-only, and distinct corpora
  * get distinct artifacts. Value correctness of the emitted report is
  * the DuckDB oracle's job — this spec pins the SKIP-TRAINING behavior,
  * which no oracle can see.
  */
class BpeArtifactSpec extends SparkSpec {

  test("encode-only query trains once per corpus; reruns skip training") {
    Artifacts.clear()
    val before = Artifacts.trainCount
    val q = SparkEntry.queries("text_bpe_artifact")
    val first = q(spark, sfDir).collect().toSeq
    val afterFirst = Artifacts.trainCount
    assert(afterFirst == before + 1, "first run must train the vocabulary")
    val second = q(spark, sfDir).collect().toSeq
    val third = q(spark, sfDir).collect().toSeq
    assert(Artifacts.trainCount == afterFirst,
      "reruns must encode with the cached artifact, never retrain")
    assert(second == first && third == first,
      "cached-artifact encode must reproduce the trained-run report")
    // a different corpus is a different artifact
    q(spark, "/root/testdata/sf0.01").collect()
    assert(Artifacts.trainCount == afterFirst + 1,
      "a new corpus key must train its own vocabulary")
  }

  test("per-language encode trains each language once; reruns skip all four") {
    Artifacts.clear()
    val before = Artifacts.trainCount
    val q = SparkEntry.queries("text_bpe_perlang_artifact")
    val first = q(spark, sfDir).collect().toSeq
    val afterFirst = Artifacts.trainCount
    assert(afterFirst == before + 4,
      "first run must train one vocabulary per language")
    val second = q(spark, sfDir).collect().toSeq
    assert(Artifacts.trainCount == afterFirst,
      "reruns must encode every language with its cached artifact")
    assert(second == first,
      "cached-artifact encode must reproduce the trained-run report")
  }
}

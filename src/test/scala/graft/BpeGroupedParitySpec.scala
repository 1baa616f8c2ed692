package graft

import org.apache.spark.sql.functions._

/** BpeTrainer.trainGrouped (one fused job per round, all groups) must
  * produce EXACTLY the merge table of BpeTrainer.train run once per
  * group — rank for rank, pair for pair, weight for weight — including
  * the tie-break (weight DESC, pa, pb) and the "no pair → no merge"
  * round behavior. This pins the r11 text_bpe_perlang rewrite to the
  * oracle's per-language CTE replay.
  */
class BpeGroupedParitySpec extends SparkSpec {

  test("trainGrouped == per-group train, ties and degenerate groups included") {
    import spark.implicits._
    val rows = Seq(
      // "en": planted tie — (a,b) and (b,a) both weight 5 → lex order decides
      ("en", "abab", 2L), ("en", "ba", 1L), ("en", "cd", 3L),
      // "de": chains force multi-round merges over merged symbols
      ("de", "aaaa", 4L), ("de", "aab", 2L), ("de", "bb", 1L),
      // "xx": single-char words only — no pair in ANY round
      ("xx", "a", 7L), ("xx", "b", 2L),
      // "fr": one two-char word, merges exhaust after round 1
      ("fr", "zy", 6L))
    val df = rows.toDF("lang", "word", "cnt")
    val rounds = 4

    val grouped = graft.operators.BpeTrainer.trainGrouped(df, "lang", rounds)

    for (lang <- Seq("en", "de", "xx", "fr")) {
      val solo = graft.operators.BpeTrainer
        .train(df.filter(col("lang") === lang).select(col("word"), col("cnt")),
          rounds)
        .orderBy(col("merge_rank"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
        .toSeq
      val got = grouped.getOrElse(lang, Seq.empty)
        .map(m => (m.rank, m.pa, m.pb, m.weight))
      assert(got == solo, s"lang=$lang: grouped $got != solo $solo")
    }
  }
}

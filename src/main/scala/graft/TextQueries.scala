package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis suite (SURVEY §2.E) over `documents`. All scoring is
  * built-in string/regexp expressions (codegen'd, UDF-free) so the
  * same computation is expressible in the DuckDB oracle.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Occurrences of a literal in text via length-difference. */
  private def hits(c: Column, lit0: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(lit0), ""))) / lit0.length).cast("long")

  private def hitsSql(expr0: String, lit0: String): String =
    s"CAST((length($expr0) - length(replace($expr0, '$lit0', ''))) / ${lit0.length} AS BIGINT)"

  private val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " a "),
    "es" -> Seq(" el ", " la ", " de "),
    "fr" -> Seq(" le ", " et ", " un "),
    "de" -> Seq(" der ", " und ", " ein "))

  // E1 — stopword-profile language ID with deterministic tiebreak.
  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = Profiles.map { case (lang, words) =>
      lang -> words.map(w => hits(padded, w)).reduce(_ + _)
    }
    val pred = when(scores("en") >= scores("es") && scores("en") >= scores("fr") && scores("en") >= scores("de"), "en")
      .when(scores("es") >= scores("fr") && scores("es") >= scores("de"), "es")
      .when(scores("fr") >= scores("de"), "fr")
      .otherwise("de")
    docs(s, dir).select(col("doc_id"), pred.as("pred_lang"),
      scores("en").as("score_en"), scores("es").as("score_es"),
      scores("fr").as("score_fr"), scores("de").as("score_de"))
      .orderBy(col("doc_id"))
  }

  private val textLangidSql = {
    val p = "concat(' ', lower(text), ' ')"
    def score(words: Seq[String]) = words.map(w => hitsSql(p, w)).mkString(" + ")
    val en = score(Profiles("en")); val es = score(Profiles("es"))
    val fr = score(Profiles("fr")); val de = score(Profiles("de"))
    s"""WITH sc AS (
       | SELECT doc_id, $en AS score_en, $es AS score_es, $fr AS score_fr, $de AS score_de
       | FROM documents
       |)
       |SELECT doc_id,
       | CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
       |      WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
       |      WHEN score_fr >= score_de THEN 'fr'
       |      ELSE 'de' END AS pred_lang,
       | score_en, score_es, score_fr, score_de
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  // E2 — quality scoring: length / punctuation / digit / stopword ratios.
  private def textQuality(s: SparkSession, dir: String): DataFrame = {
    val len = length(col("text")).cast("long")
    val punct = length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double")
    val digit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val stopHits = Seq(" the ", " and ", " of ").map(w => hits(padded, w)).reduce(_ + _)
    docs(s, dir).select(col("doc_id"),
      len.as("text_len"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1).cast("long").as("n_words_approx"),
      round(punct / len, 4).as("punct_ratio"),
      round(digit / len, 4).as("digit_ratio"),
      round(stopHits * 5.0 / len, 4).as("stop_ratio"),
      when(len >= 100 && punct / len <= 0.1, 1L).otherwise(0L).as("quality_flag"))
      .orderBy(col("doc_id"))
  }

  private val textQualitySql = {
    val p = "concat(' ', lower(text), ' ')"
    val stop = Seq(" the ", " and ", " of ").map(w => hitsSql(p, w)).mkString(" + ")
    s"""SELECT doc_id,
       | CAST(length(text) AS BIGINT) AS text_len,
       | CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words_approx,
       | round(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio,
       | round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 4) AS digit_ratio,
       | round(($stop) * 5.0 / length(text), 4) AS stop_ratio,
       | CAST(CASE WHEN length(text) >= 100
       |   AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) <= 0.1
       |   THEN 1 ELSE 0 END AS BIGINT) AS quality_flag
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // E3 — token counting: whitespace words + BPE-ish regex tokens.
  private val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  private def textTokens(s: SparkSession, dir: String): DataFrame = {
    val toks = size(expr(s"regexp_extract_all(text, '$TokenPattern', 0)")).cast("long")
    val words = size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).cast("long")
    docs(s, dir).select(col("doc_id"),
      toks.as("n_tokens"), words.as("n_words"),
      round(length(col("text")).cast("double") / greatest(toks, lit(1L)), 4).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  private val textTokensSql =
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all(text, '$TokenPattern')) AS BIGINT) AS n_tokens,
       | CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
       | round(CAST(length(text) AS DOUBLE) /
       |   greatest(len(regexp_extract_all(text, '$TokenPattern')), 1), 4) AS chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  // E4 — document fingerprint: full-text modular polynomial hash +
  // winnowing-style min over rolling 8-gram polynomial hashes (modular
  // arithmetic keeps it in BIGINT range on both engines). Native
  // codegen'd expressions (graft.functions.TextHashExpressions) — the
  // nested-HOF formulation ran an interpreted fold per window and was
  // the slowest query in the r2 bench (48 s → sub-second at sf0.1).
  private def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    def nat(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      GraftBridge.column(e)
    docs(s, dir).select(col("doc_id"),
      nat(graft.functions.PolyHashExpr(GraftBridge.expression(col("text"))))
        .as("full_fp"),
      nat(graft.functions.MinGramHashExpr(GraftBridge.expression(col("text")), 8))
        .as("min_gram_fp"))
      .orderBy(col("doc_id"))
  }

  private val textFingerprintSql =
    """SELECT doc_id,
      | list_reduce(
      |   list_prepend(7::BIGINT, list_transform(generate_series(1, length(text)),
      |     i -> ascii(substring(text, i, 1))::BIGINT)),
      |   (acc, c) -> (acc * 31 + c) % 1000000007) AS full_fp,
      | list_min(list_transform(generate_series(1, greatest(length(text) - 7, 1)), i ->
      |   list_reduce(
      |     list_prepend(7::BIGINT, list_transform(generate_series(i, i + 7),
      |       k -> ascii(substring(text, k, 1))::BIGINT)),
      |     (acc, c) -> (acc * 31 + c) % 1000000007))) AS min_gram_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // E5 — TF-IDF: top-5 terms per document. One explode + three
  // aggregations (term-frequency, doc length, document frequency);
  // the corpus size joins in as a broadcast scalar. Identical
  // double arithmetic on both engines keeps the ranking stable
  // (ties broken by term).
  private def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val tokens = expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    val toks = docs(s, dir).select(col("doc_id"), explode(tokens).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
    val docLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("total"))
    val dfreq = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(docLen, "doc_id")
      .join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", (col("cnt") / col("total")) * log(col("n_docs") / col("dfreq")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("rnk"), col("term"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private val textTfidfSql =
    """WITH toks AS (
      | SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |   x -> x <> '')) AS term
      | FROM documents
      |), tf AS (
      | SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY doc_id, term
      |), dl AS (
      | SELECT doc_id, count(*) AS total FROM toks GROUP BY doc_id
      |), dfr AS (
      | SELECT term, count(*) AS dfreq FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
      |), scored AS (
      | SELECT tf.doc_id, tf.term,
      |   (tf.cnt / dl.total) * ln((SELECT count(*) FROM documents) / dfr.dfreq) AS tfidf
      | FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN dfr ON tf.term = dfr.term
      |), ranked AS (
      | SELECT doc_id, term, tfidf,
      |   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
      | FROM scored
      |)
      |SELECT doc_id, rnk, term, round(tfidf, 6) AS tfidf
      |FROM ranked WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _),
    "text_tfidf" -> (textTfidf _))

  val oracles: Map[String, String] = Map(
    "text_langid" -> textLangidSql,
    "text_quality" -> textQualitySql,
    "text_tokens" -> textTokensSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_tfidf" -> textTfidfSql)
}

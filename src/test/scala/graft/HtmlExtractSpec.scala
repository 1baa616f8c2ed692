package graft

import org.apache.spark.sql.functions.col

/** E30 `text_html_extract` — boilerplate removal by link density.
  *
  * The strongest check available: an independent plain-Scala
  * reimplementation of the whole pipeline (fixture synthesis +
  * extraction) on the driver, compared row-for-row against the Spark
  * result including the md5 fingerprint of the extracted main text.
  * Plus the scale property the docstring promises: the plan is
  * map-only — exactly one Exchange, and it belongs to the output sort.
  */
class HtmlExtractSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference implementation, structured like the prose spec, not the
    * SQL: synthesize the blocks, then classify each line. */
  private def reference(docId: Long, text: String): (Long, Long, Long, String, String) = {
    val words = text.split(" ", -1) // split(' ') keeps empty trailing fields in SQL too
    val np = math.max((words.length + 7) / 8, 1)
    val paras = (0 until np).map(i => words.slice(i * 8, i * 8 + 8).mkString(" "))
    val blocks = paras.zipWithIndex.map { case (p, i) =>
      if ((docId + i) % 5 == 0) s"""<p><a href="#">$p</a></p>"""
      else s"<p>$p</p>"
    }
    val lines =
      Seq("""<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>""") ++
        blocks ++
        Seq("""<div><a href="#">Buy now</a> <a href="#">Subscribe</a></div>""",
          """<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> (c) ExampleCorp</footer>""")
    def strip(l: String) = l.replaceAll("<[^>]*>", "")
    def linkText(l: String) = {
      val m = java.util.regex.Pattern.compile("<a[^>]*>([^<]*)</a>").matcher(l)
      val b = new StringBuilder
      while (m.find()) b.append(m.group(1))
      b.toString
    }
    val kept = lines.filter(l =>
      strip(l).length >= 20 && 3 * linkText(l).length < strip(l).length)
    val main = kept.map(strip).mkString(" ")
    (lines.size.toLong, kept.size.toLong, main.length.toLong, main,
      md5hex(main).take(8))
  }

  test("Spark result matches the independent Scala reimplementation, fp included") {
    val got = SparkEntry.queries("text_html_extract")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))))
      .toMap
    val texts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val (nb, nk, ml, main, fp) = reference(id, text)
      val (gnb, gnk, gml, gfp) = got(id)
      withClue(s"doc $id: ") {
        assert(gnb == nb, s"n_blocks $gnb != $nb")
        assert(gnk == nk, s"n_kept $gnk != $nk")
        assert(gml == ml, s"main_len $gml != $ml")
        assert(gfp == fp, s"main_fp $gfp != $fp (main=$main)")
      }
    }
  }

  test("boilerplate never survives extraction; link-farm paragraphs are dropped") {
    val texts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    var keptAny = 0
    texts.foreach { case (id, text) =>
      val (_, nk, _, main, _) = reference(id, text)
      assert(!main.contains("Home") && !main.contains("Buy now") &&
        !main.contains("Privacy") && !main.contains("ExampleCorp"),
        s"doc $id: boilerplate leaked into main: $main")
      if (nk > 0) keptAny += 1
      // every kept word must come from the original document
      val vocab = text.split(" ", -1).toSet
      main.split(" ", -1).filter(_.nonEmpty).foreach(w =>
        assert(vocab.contains(w), s"doc $id: foreign token '$w' in main"))
    }
    assert(keptAny > texts.length / 2, "extraction dropped everything")
  }

  test("plan is map-only: exactly one Exchange, owned by the output sort") {
    val df = SparkEntry.queries("text_html_extract")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected the single range-partition Exchange of the orderBy, got $exchanges:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate in a map-only pipeline:\n$plan")
  }
}

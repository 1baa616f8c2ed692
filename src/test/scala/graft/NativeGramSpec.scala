package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.functions._

/** Each native text expression must equal the interpreted HOF/SQL
  * shape it replaced, value-for-value, on adversarial inputs — this is
  * the contract that lets the DuckDB string oracles keep proving the
  * rewired queries.
  */
class NativeGramSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e",                      // short tokens
    "one-two,three;four!five six",    // separators
    "ALL CAPS AND MiXeD CaSe toKENS", // lowercasing
    "  leading and trailing   ",      // whitespace runs
    "singleton",                      // 1 token
    "two tokens",                     // < k for k>=3
    "...,,,!!!",                      // no tokens at all
    "",                               // empty string
    "repeat repeat repeat repeat",    // duplicate grams
    "numbers 123 mix4d t0kens 99",
    "x " * 300 + "y"                  // long doc
  )

  private def df = cases.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("WordGramHashesExpr distinct-count == HOF distinct gram count (k=3,5)") {
    for (k <- Seq(2, 3, 5)) {
      val hof = df.withColumn("toks",
          expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"))
        .select(col("doc_id"), expr(
          s"""size(array_distinct(if(size(toks) >= $k,
             |  transform(sequence(1, size(toks) - ${k - 1}),
             |    i -> concat_ws(' ', slice(toks, i, $k))),
             |  array())))""".stripMargin).as("n"))
        .as[(Long, Int)].collect().toMap
      val native = df.select(col("doc_id"), size(GraftBridge.column(
          WordGramHashesExpr(GraftBridge.expression(col("text")), k))).as("n"))
        .as[(Long, Int)].collect().toMap
      // the HOF emits one empty-ish gram when there are no tokens
      // (if-guard yields array() → size 0) — counts must agree exactly
      cases.indices.foreach { i =>
        assert(native(i.toLong) == hof(i.toLong),
          s"k=$k doc $i: native ${native(i.toLong)} != hof ${hof(i.toLong)}: '${cases(i)}'")
      }
    }
  }

  test("WordGramHashesExpr positional count == window count") {
    val native = df.select(col("doc_id"), size(GraftBridge.column(
        WordGramHashesExpr(GraftBridge.expression(col("text")), 3,
          distinct = false))).as("n"))
      .as[(Long, Int)].collect().toMap
    val toks = df.withColumn("toks",
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"))
      .select(col("doc_id"), size(col("toks")).as("nt"))
      .as[(Long, Int)].collect().toMap
    cases.indices.foreach { i =>
      val expected = math.max(toks(i.toLong) - 2, 0)
      assert(native(i.toLong) == expected,
        s"doc $i: ${native(i.toLong)} != $expected")
    }
  }

  test("WordShingleModHashesExpr == the aggregate-lambda p fold") {
    val hof = df.withColumn("toks",
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(
          |  sequence(0, greatest(size(toks) - 3, 0)),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3))))""".stripMargin)).as("sh"))
      .withColumn("p", expr(
        """aggregate(
          |  transform(sequence(1, length(sh)), i -> ascii(substring(sh, i, 1))),
          |  CAST(7 AS BIGINT),
          |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin))
      .select(col("doc_id"), col("p")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val native = df.select(col("doc_id"), explode(GraftBridge.column(
        WordShingleModHashesExpr(GraftBridge.expression(col("text")), 3))).as("p"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    cases.indices.map(_.toLong).foreach { i =>
      assert(native.getOrElse(i, Set.empty) == hof.getOrElse(i, Set.empty),
        s"doc $i shingle-hash sets differ")
    }
  }

  test("CharCountHistExpr == per-char explode counts") {
    val hof = df.filter(length(col("text")) >= 1)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("d"),
        sort_array(collect_list(col("c"))).as("cs"))
      .as[(Long, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val native = df.filter(length(col("text")) >= 1)
      .select(col("doc_id"), explode(GraftBridge.column(
        CharCountHistExpr(GraftBridge.expression(col("text"))))).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("d"),
        sort_array(collect_list(col("c"))).as("cs"))
      .as[(Long, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(native == hof)
  }

  test("SimhashExpr == the exploded-token 64-column signature") {
    def poly(mult: Int, mod: Long, init: Long) = expr(
      s"""aggregate(
         |  transform(sequence(1, length(tok)), i -> ascii(substring(tok, i, 1))),
         |  CAST($init AS BIGINT),
         |  (acc, c) -> (acc * $mult + c) % $mod)""".stripMargin)
    val tok = df
      .withColumn("toks", expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", shiftleft(poly(31, 1000000007L, 7), 31) + poly(37, 998244353L, 11))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
      .reduce(_ bitwiseOR _)
    val hof = agg.select(col("doc_id"), simhash.as("s"))
      .as[(Long, Long)].collect().toMap
    val native = df
      .filter(size(expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")) >= 1)
      .select(col("doc_id"), GraftBridge.column(
        SimhashExpr(GraftBridge.expression(col("text")))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native == hof, s"native $native != hof $hof")
  }

  test("GramCodeHitsExpr hit counts == string profile join counts") {
    val profile = Seq(" th", "the", "he ", "ick", "own").map(g =>
      (g, GramCodeHitsExpr.code(g)))
    val hof = df.filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(lower(text), i, 3))"))
        .as("g"))
      .join(profile.toDF("g", "code"), Seq("g"))
      .groupBy(col("doc_id"), col("code")).agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().toSet
    val native = df.filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(GraftBridge.column(
        GramCodeHitsExpr(GraftBridge.expression(col("text")), 3,
          profile.map(_._2)))).as("code"))
      .groupBy(col("doc_id"), col("code")).agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().toSet
    assert(native == hof)
  }

  test("AmsSigmaVecExpr == exploded polynomial sigma (all 64 counters)") {
    // keys spanning sf0.1-native ids, sf1 copy-shifted ids (+n·1e8),
    // multiples of P, and P±1 (the mod boundaries)
    val keys = Seq(0L, 1L, 2L, 977L, 1000002L, 1000003L, 1000004L,
      2000006L, 19999L, 100000042L, 900000123L, 123456789L)
    val kdf = keys.map(Tuple1(_)).toDF("k")
    val hof = kdf
      .select(col("k"), explode(sequence(lit(0), lit(63))).as("j"))
      .withColumn("kk", col("k") % 1000003L)
      .withColumn("a3", (lit(104729L) * (col("j") + 1)) % 1000003L)
      .withColumn("a2", (lit(7919L) * (col("j") + 3) * (col("j") + 3)) % 1000003L)
      .withColumn("a1", (lit(4099L) * (col("j") + 7) * (col("j") + 7)) % 1000003L)
      .withColumn("a0", (lit(977L) * (col("j") + 11)) % 1000003L)
      .withColumn("sigma",
        lit(1L) - lit(2L) * ((((((col("a3") * col("kk") + col("a2")) % 1000003L)
          * col("kk") + col("a1")) % 1000003L)
          * col("kk") + col("a0")) % 1000003L % 2L))
      .select(col("k"), col("j"), col("sigma"))
      .as[(Long, Int, Long)].collect().toSet
    val native = kdf
      .select(col("k"), posexplode(GraftBridge.column(
        AmsSigmaVecExpr(GraftBridge.expression(col("k")), 64))))
      .select(col("k"), col("pos"), col("col"))
      .as[(Long, Int, Long)].collect().toSet
    assert(native == hof)
  }

  test("HashFeaturesExpr == explode -> two-level groupBy shape (64 buckets)") {
    val hof = df
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("tok"))
      .withColumn("bucket", expr(
        """aggregate(
          |  transform(sequence(1, length(tok)), i -> ascii(substring(tok, i, 1))),
          |  CAST(7 AS BIGINT),
          |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin) % 64)
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nnz"), sum(col("c")).as("n_tokens"),
        min(struct((-col("c")).as("nc"), col("bucket").as("b"))).as("top"),
        sum(col("c") * col("c")).as("sumsq"))
      .select(col("doc_id"), col("nnz"), col("n_tokens"),
        col("top.b").as("top_bucket"), (-col("top.nc")).as("top_count"),
        col("sumsq"))
    val native = df
      .select(col("doc_id"), GraftBridge.column(
        HashFeaturesExpr(GraftBridge.expression(col("text")), 64)).as("f"))
      .filter(expr("f[1] > 0"))
      .select(col("doc_id"), expr("f[0]").as("nnz"), expr("f[1]").as("n_tokens"),
        expr("f[2]").as("top_bucket"), expr("f[3]").as("top_count"),
        expr("f[4]").as("sumsq"))
    val h = hof.orderBy("doc_id").collect().map(_.toSeq)
    val n = native.orderBy("doc_id").collect().map(_.toSeq)
    assert(h.toSeq == n.toSeq)
  }

  test("LiteralHitsExpr == per-literal regexp_replace hits stack") {
    // the E1 literal set plus overlap-adversarial literals
    val lits = Seq(" the ", " and ", " a ", " el ", " la ", " de ",
      " le ", " et ", " un ", " der ", " und ", " ein ", "aa", " ")
    val adversarial = df.unionByName(Seq(
      (100L, "aaaaa aa a the the the and"), // overlapping runs
      (101L, "THE AND A EL LA DE LE ET UN DER UND EIN"),
      (102L, "a a a a a a")
    ).toDF("doc_id", "text"))
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val hofCols = lits.zipWithIndex.map { case (w, i) =>
      TextQueries.hits(padded, w).as(s"h$i") }
    val hof = adversarial.select(col("doc_id") +: hofCols: _*)
    val native = adversarial.select(col("doc_id") +: lits.indices.map(i =>
      element_at(GraftBridge.column(LiteralHitsExpr(
        GraftBridge.expression(col("text")), lits)), i + 1).as(s"h$i")): _*)
    assert(hof.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      native.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }
}

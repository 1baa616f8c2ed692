package graft

import org.apache.spark.sql.functions._

/** The r10 packed-pool simhash pipeline emits each near-dup pair
  * exactly once (canonical-table emission) instead of distinct-ing a
  * 10-table fan-out. This pins:
  *   - set equality vs the naive reference (explode all piece-pair
  *     tables, pool = lowest-cap ids per key, join, hamming ≤ 3,
  *     distinct) — with a TINY cap (2) on a corpus of planted
  *     near-identical signature families, so pool membership differs
  *     per table and the poolmask logic is exercised where it can
  *     actually go wrong;
  *   - duplicate-freeness of the canonical emission;
  *   - tableKey (the in-expression piece function) == the DataFrame
  *     piece arithmetic the oracle replays.
  */
class SimhashPackedParitySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic 62-bit-ish signatures: LCG base per family, then
    * 0-3 planted bit flips per member — guarantees hamming ≤ 3 pairs
    * inside families and far pairs across them.
    */
  private def sigs(): Seq[(Long, Long)] = {
    def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
    (0 until 400).map { i =>
      val fam = i / 8
      val base = lcg(lcg(fam.toLong + 77)) & 0x3fffffffffffffffL
      val flips = i % 4
      val s = (0 until flips).foldLeft(base)((x, j) =>
        x ^ (1L << (math.abs(lcg(i.toLong * 31 + j)) % 64).toInt))
      (i.toLong, s)
    }
  }

  test("packed canonical emission == naive distinct pool join at a binding cap") {
    val df = sigs().toDF("doc_id", "simhash")
    val cap = 2
    val got = DedupQueries.simhashNearDupPairs(df, cap)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(got.map(t => (t._1, t._2)).distinct.length == got.length,
      "canonical emission produced duplicate pairs")

    // naive reference over the same 5-piece layout
    val pieces = expr(
      "array(simhash & 8191, shiftright(simhash, 13) & 8191, " +
        "shiftright(simhash, 26) & 8191, shiftright(simhash, 39) & 8191, " +
        "shiftright(simhash, 52) & 4095)")
    val combos = for { p <- 0 until 5; q <- (p + 1) until 5 } yield (p, q)
    val keyed = df.withColumn("pieces", pieces)
      .select(col("doc_id"), col("simhash"),
        explode(array(combos.map { case (p, q) =>
          struct(lit(p * 5 + q).as("tbl"),
            (element_at(col("pieces"), p + 1) * lit(8192L) +
              element_at(col("pieces"), q + 1)).as("key"))
        }: _*)).as("pk"))
      .select(col("doc_id"), col("simhash"),
        col("pk.tbl").as("tbl"), col("pk.key").as("key"))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tbl"), col("key")).orderBy(col("doc_id"))
    val a = keyed.withColumn("prn", row_number().over(wK))
      .filter(col("prn") <= cap)
      .select(col("tbl"), col("key"),
        col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val want = a.join(keyed.select(col("tbl"), col("key"),
        col("doc_id").as("id_b"), col("simhash").as("sh_b")), Seq("tbl", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(want.nonEmpty, "fixture produced no pairs — the test is vacuous")
    assert(got.toSet == want.toSet,
      s"packed emission diverged: only-got=${(got.toSet -- want.toSet).take(5)} " +
        s"only-want=${(want.toSet -- got.toSet).take(5)}")
  }

  test("tableKey matches the DataFrame piece arithmetic for every table") {
    val e = graft.functions.SimhashPoolMatchesExpr(
      org.apache.spark.sql.GraftBridge.expression(lit(0L)),
      org.apache.spark.sql.GraftBridge.expression(lit(0L)),
      org.apache.spark.sql.GraftBridge.expression(lit(0)),
      org.apache.spark.sql.GraftBridge.expression(
        typedlit(Seq.empty[(Long, Long, Long)])), 3)
    def piece(s: Long, i: Int): Long =
      if (i < 4) (s >> (13 * i)) & 8191L else (s >> 52) & 4095L
    val rnd = new scala.util.Random(4242)
    (0 until 2000).foreach { _ =>
      val s = rnd.nextLong()
      for { p <- 0 until 5; q <- (p + 1) until 5 } {
        val t = p * 5 + q
        assert(e.tableKey(s, t) == piece(s, p) * 8192L + piece(s, q),
          f"tableKey mismatch at t=$t for sig $s%x")
      }
    }
  }
}

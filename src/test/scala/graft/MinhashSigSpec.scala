package graft

import org.apache.spark.sql.functions._

/** Pins the r10 native minhash signature (MinhashSigExpr) to the
  * explode × permutations → groupBy.min formula it replaced:
  * bit-equal (doc_id, j, m) rows, and band hashes bit-equal to the
  * bit_xor aggregate — including duplicate-shingle docs (min over the
  * multiset) and a no-token doc (absent from BOTH shapes).
  */
class MinhashSigSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the bank"),
    (2L, "aa bb aa bb aa bb aa bb aa bb"), // heavy duplicate shingles
    (3L, "one two three"),                // exactly one 3-shingle
    (4L, "short doc"),                    // fewer tokens than k
    (5L, "!!! ...  ---"),                 // NO tokens: absent everywhere
    (6L, "Mixed CASE and Punct-uation, splitting 123 tokens 456 ok")
  ).toDF("doc_id", "text")

  /** The pre-r10 formula, verbatim. */
  private def oldValues = {
    val shingleRows = docsDf
      .select(col("doc_id"), explode(org.apache.spark.sql.GraftBridge.column(
        graft.functions.WordShingleModHashesExpr(
          org.apache.spark.sql.GraftBridge.expression(col("text")), 3))).as("p"))
    shingleRows
      .select(col("doc_id"), col("p"), explode(sequence(lit(0), lit(63))).as("j"))
      .select(col("doc_id"), col("j"),
        ((col("p") * (col("j") * 2 + 1) + (col("j") * 7919 + 13)) % 1000000007L).as("h"))
      .groupBy(col("doc_id"), col("j")).agg(min(col("h")).as("m"))
  }

  test("native signature values == exploded groupBy.min, no-token doc absent") {
    val want = oldValues.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val got = DedupQueries.minhashValuesFor(docsDf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
    assert(!got.exists(_._1 == 5L))
    assert(got.count(_._1 == 2L) == 64)
  }

  test("native band hashes == bit_xor aggregate bands") {
    val want = oldValues
      .groupBy(col("doc_id"), expr("j DIV 8").as("band_id"))
      .agg(bit_xor((col("m") * 131 + col("j")) % 1000000007L).as("band_hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = DedupQueries.minhashBandsFor(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
  }
}

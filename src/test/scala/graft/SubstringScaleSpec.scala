package graft

import org.apache.spark.sql.functions._

/** C13 `dedup_substring` at probe scale: 10⁶ docs generated ON THE
  * EXECUTORS (no driver data), 10% carrying a planted 12-token
  * boilerplate run, every other token globally unique (doc-id- and
  * position-salted), so the expected duplicated-token mass is EXACT:
  * 12 for planted docs, 0 for clean ones. Drives the exact shipped
  * core ([[DedupQueries.substringSpansFor]]). What this certifies for
  * 100 TB: candidate work is linear in corpus windows (one digest
  * hash agg + one digest join — no pairwise term grows with the
  * 100k-strong duplicate family), and the planted mass is recovered
  * to the token at a million docs.
  */
class SubstringScaleSpec extends SparkSpec {

  test("1M docs: planted 12-token boilerplate recovered exactly") {
    val n = 1000000L
    val boiler = (0 until 12).map(i => s"b$i").mkString(" ")
    // 10 unique + (planted? boilerplate : 12 unique) + 10 unique = 32 toks
    val docsDf = spark.range(n)
      .select(col("id").as("doc_id"), expr(
        s"""concat(
           |  concat_ws(' ', transform(sequence(0, 9),  i -> concat('u', id, 'a', i))), ' ',
           |  IF(id % 10 = 0, '$boiler',
           |     concat_ws(' ', transform(sequence(0, 11), i -> concat('u', id, 'b', i)))), ' ',
           |  concat_ws(' ', transform(sequence(0, 9),  i -> concat('u', id, 'c', i))))"""
          .stripMargin).as("text"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val out = DedupQueries.substringSpansFor(docsDf)
      .groupBy((col("doc_id") % 10 === 0).as("planted"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("dup_tokens")).as("min_dup"), max(col("dup_tokens")).as("max_dup"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"1M-doc substring span pass: $sec%.1f s")
    assert(out(true) == ((100000L, 12L, 12L)), s"planted: ${out(true)}")
    assert(out(false) == ((900000L, 0L, 0L)), s"clean: ${out(false)}")
  }
}

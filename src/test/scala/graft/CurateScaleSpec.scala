package graft

import org.apache.spark.sql.functions._

/** The C9/J9 corpus-duplicated-ngram accounting at probe scale,
  * mirroring DedupScaleSpec: 10⁶ synthetic docs generated on the
  * executors, 10% carrying a shared 8-token boilerplate run (the
  * "same footer on every page" pathology the C4/Dolma gate exists
  * for), through the exact [[DedupQueries.corpusNgramStatsFor]] shape
  * the query ships. The numbers that decide 100 TB feasibility:
  *
  *   - the DUP-GRAM SET size: the join-back side of the accounting —
  *     a handful of boilerplate grams, NOT proportional to the corpus,
  *     which is what makes the join broadcastable at scale;
  *   - gram-key frequency: the groupBy(gram) partial-aggregates
  *     map-side, so a 100k-doc boilerplate gram is a big COUNT, not a
  *     big shuffle group — asserted via the accounting finishing with
  *     exact per-doc results;
  *   - detection: every planted doc reports exactly the boilerplate's
  *     interior grams as duplicated; clean docs report zero.
  */
class CurateScaleSpec extends SparkSpec {

  import spark.implicits._

  test("1M docs: boilerplate gram accounting is exact and the dup set stays tiny") {
    val n = 1000000L
    // 16 nonlinear-LCG tokens per doc (the DedupScaleSpec generator —
    // jointly nonlinear in (doc, position), modulus above corpus size,
    // so no accidental shared grams); every 10th doc appends the same
    // 8-token boilerplate run b0..b7.
    val docsDf = spark.range(n)
      .withColumn("x", expr("pmod(id * 48271L + 11L, 1000003L)"))
      .select(col("id").as("doc_id"), expr(
        """concat(
          | concat_ws(' ', transform(sequence(0, 15), i ->
          |   concat('w', pmod(x * x * (i + 3) + x * (i * i * 31 + 7) + i, 1000003L)))),
          | CASE WHEN id % 10 = 0
          |   THEN concat(' ', concat_ws(' ', transform(sequence(0, 7), i -> concat('b', i))))
          |   ELSE '' END)""".stripMargin).as("text"))
      .localCheckpoint(true)

    val t0 = System.nanoTime()
    val stats = DedupQueries.corpusNgramStatsFor(docsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    stats.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // Planted docs: 24 tokens -> 20 grams; grams fully inside the
    // boilerplate: positions 17..20 = 4 grams, each shared by 100k
    // docs. Boundary grams mix own tokens -> unique. Clean docs: 0.
    val agg = stats.agg(
      sum(when(col("n_dup") === 4L, 1L).otherwise(0L)).as("planted_exact"),
      sum(when(col("n_dup") =!= 0L && col("n_dup") =!= 4L, 1L).otherwise(0L)).as("odd"),
      sum(when(col("n_dup") === 0L, 1L).otherwise(0L)).as("clean"),
      sum(col("n_grams")).as("gram_rows")).collect()(0)
    val (plantedExact, odd, clean) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    info(f"1M-doc gram accounting: $sec%.1f s, " +
      f"$plantedExact planted exact, $odd off-profile, $clean clean, " +
      f"${agg.getLong(3)} gram rows")
    assert(plantedExact == n / 10, s"expected ${n / 10} planted, got $plantedExact")
    assert(odd == 0L, s"$odd docs with unexpected dup counts (generator aliasing?)")
    assert(clean == n - n / 10)

    // The dup-set (join-back side) must be O(boilerplate), not O(corpus)
    val grams = docsDf
      .withColumn("toks", expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', slice(toks, i, 5)))""".stripMargin)).as("gram"))
    val nd = grams.select(col("doc_id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .count()
    info(s"dup-gram set size: $nd")
    assert(nd == 4L, s"dup set should be the 4 boilerplate grams, got $nd")
    stats.unpersist(false)
  }
}

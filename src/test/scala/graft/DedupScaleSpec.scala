package graft

import org.apache.spark.sql.functions._

/** MinHash-LSH at probe scale, mirroring AnnScaleSpec: 10⁶ synthetic
  * docs generated ON THE EXECUTORS (spark.range + LCG token
  * expressions, no driver data), the full C2 band pipeline
  * ([[DedupQueries.minhashBandsFor]] — the exact explode + map-side-min
  * shape the query ships), planted near-dup families, and the two
  * numbers that decide 100 TB feasibility:
  *
  *   - recall on planted pairs: a one-token edit on a 16-token doc
  *     keeps Jaccard 13/15 ≈ 0.87, which the 8×8 banding catches with
  *     p ≈ 0.95 — the pipeline must actually find them;
  *   - band-bucket size distribution: the band hash is the SHUFFLE KEY
  *     of the candidate join, so a degenerate bucket is the skew that
  *     kills the join at scale. Buckets must stay near family size
  *     (random collisions are birthday-bounded), and total candidate
  *     volume must stay linear-ish in docs, nowhere near n².
  */
class DedupScaleSpec extends SparkSpec {

  import spark.implicits._

  test("1M docs: planted near-dup recall and bounded band buckets") {
    val n = 1000000L
    // even ids: 16 LCG tokens from own id; odd ids ending a planted pair
    // (id % 200 == 1): the even twin's first 15 tokens + one unique token
    // token t(id, i) must be jointly nonlinear in (doc, position) — any
    // f(a·id + b·i) generator makes doc pairs at the right id spacing
    // SHIFTED copies of each other (accidental near-dup families). The
    // per-doc seed x feeds i-dependent quadratic coefficients instead.
    val docsDf = spark.range(n)
      .withColumn("x", expr(
        "pmod((CASE WHEN id % 200 = 1 THEN id - 1 ELSE id END) * 48271L + 11L, 1000003L)"))
      .select(col("id").as("doc_id"), expr(
        """CASE WHEN id % 200 = 1 THEN
          | concat(concat_ws(' ', transform(sequence(0, 14), i ->
          |   concat('w', pmod(x * x * (i + 3) + x * (i * i * 31 + 7) + i, 1000003L)))),
          |   ' z', id)
          |ELSE
          | concat_ws(' ', transform(sequence(0, 15), i ->
          |   concat('w', pmod(x * x * (i + 3) + x * (i * i * 31 + 7) + i, 1000003L))))
          |END""".stripMargin).as("text"))
      .localCheckpoint(true) // materialize so timings measure the pipeline
    val t0 = System.nanoTime()
    val bands = DedupQueries.minhashBandsFor(docsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.count()
    val bandSec = (System.nanoTime() - t0) / 1e9

    // bucket-size distribution over the candidate join's shuffle key
    val stats = bands.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("max_c"),
        sum(expr("c * (c - 1) DIV 2")).as("cand_pairs"),
        count(lit(1)).as("n_buckets"))
      .collect()(0)
    val (maxC, candPairs, nBuckets) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    info(f"1M-doc LSH: bands $bandSec%.1f s, max bucket $maxC, " +
      f"$nBuckets buckets, $candPairs candidate pairs")
    // skew: no degenerate bucket — candidate work per bucket is O(c²),
    // so the max decides whether AQE skew handling is even needed
    assert(maxC <= 32L, s"degenerate band bucket of size $maxC")
    // volume: ~5k planted + birthday collisions, nowhere near n²
    assert(candPairs <= 100000L,
      s"candidate volume $candPairs blew past linear-ish bounds")

    // recall on the 5000 planted (2k, 2k+1) pairs
    val t1 = System.nanoTime()
    val a = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
    val b = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"))
    val found = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .filter(col("id_b") === col("id_a") + 1 && col("id_a") % 200 === 0)
      .count()
    val joinSec = (System.nanoTime() - t1) / 1e9
    val planted = n / 200
    val recall = found.toDouble / planted
    info(f"planted recall $recall%.3f ($found of $planted), join $joinSec%.1f s")
    assert(recall >= 0.9,
      f"recall $recall%.3f below 0.9 — banding lost planted near-dups")
    bands.unpersist(false)
  }
}

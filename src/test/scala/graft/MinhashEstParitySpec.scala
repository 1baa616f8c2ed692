package graft

import org.apache.spark.sql.functions._

/** C10's r11 shape (one fused row-local feature pass feeding the
  * distinct-pairs + attach-join scoring; the packed-pool and
  * int-narrowed variants were both built, measured and rejected) must
  * equal the pre-r11 shape it refines — separate signature and
  * shingle-set passes glued by a join — row for row, double for
  * double. This is the exact-output contract that keeps the unchanged
  * DuckDB oracle valid.
  */
class MinhashEstParitySpec extends SparkSpec {

  test("dedup_minhash_est == naive distinct-pairs + attach-join scoring") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = DedupQueries.queries("dedup_minhash_est")(spark, dir)
        .orderBy("id_a", "id_b").collect().map(_.toSeq)

      // the pre-r11 shape, verbatim
      val reps = Tables.load(spark, dir, "documents")
        .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      val sigDf = DedupQueries.minhashSigFor(reps)
      val bands = sigDf
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(0, 7), b -> aggregate(sequence(b*8, b*8+7), 0L,
            | (acc, j) -> acc ^ ((element_at(sig, j+1) * 131 + j) % 1000000007)))"""
            .stripMargin)).as(Seq("band_id", "band_hash")))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_id"), col("band_hash")).orderBy(col("doc_id"))
      val pool = bands.withColumn("prn", row_number().over(wB))
        .filter(col("prn") <= 256)
        .select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
      val pairs = pool
        .join(bands.select(col("band_id"), col("band_hash"),
          col("doc_id").as("id_b")), Seq("band_id", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val psets = reps
        .select(col("doc_id"), org.apache.spark.sql.GraftBridge.column(
          graft.functions.WordShingleModHashesExpr(
            org.apache.spark.sql.GraftBridge.expression(col("text")), 3))
          .as("ps0"))
        .select(col("doc_id"), array_distinct(col("ps0")).as("ps"))
      val feat = sigDf.select(col("doc_id"), col("sig")).join(psets, Seq("doc_id"))
      val naive = pairs
        .join(feat.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
          col("ps").as("ps_a")), Seq("id_a"))
        .join(feat.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
          col("ps").as("ps_b")), Seq("id_b"))
        .withColumn("est", expr(
          "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 64.0"))
        .withColumn("i", size(array_intersect(col("ps_a"), col("ps_b"))).cast("long"))
        .withColumn("na", size(col("ps_a")).cast("long"))
        .withColumn("nb", size(col("ps_b")).cast("long"))
        .select(col("id_a"), col("id_b"),
          (round(col("est"), 4) + lit(0.0)).as("est_jaccard"),
          (round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4)
            + lit(0.0)).as("exact_jaccard"),
          (round(abs((round(col("est"), 4) + lit(0.0)) -
            (round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4)
              + lit(0.0))), 4) + lit(0.0)).as("abs_err"))
        .orderBy("id_a", "id_b").collect().map(_.toSeq)

      assert(out.length == naive.length, s"pair count at $dir")
      out.zip(naive).foreach { case (a, b) => assert(a == b, s"row at $dir") }
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes the r11 after-plans to plans/r11/ — the final frames for the
  * queries whose returned plan is the full pipeline, plus REPLICAS of
  * the collect-side internal pipelines (dedup_minhash_est's scoring
  * frame, dedup_lsh_sweep's fused windowed-counter frame, one grouped
  * BPE round) whose real plans hide behind localCheckpoint stubs or
  * driver collects. The replicas copy the query code verbatim minus
  * persist/checkpoint, so the dumped lineage is the executed one.
  * Usage: runMain graft.PlanDumpR11 [sfDir]
  */
object PlanDumpR11 {

  private def dump(name: String, df: DataFrame): Unit = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"plans/r11/${name}_after.txt"), s)
    println(s"[plandump] $name: ${s.linesIterator.size} lines")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.GraftBridge

    // full-pipeline finals
    for (n <- Seq("dedup_minhash_est", "dedup_lsh_sweep", "knn_graph",
        "stream_ewma_anomaly", "text_bpe_perlang", "dedup_minhash_lsh",
        "q94_rfm", "ecs_trajectory", "src_bucketed_join"))
      dump(n, SparkEntry.queries(n)(spark, sfDir))

    val reps = Tables.load(spark, sfDir, "documents")
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))

    // dedup_minhash_est internal scoring pipeline (replica of
    // DedupQueries.dedupMinhashEst minus persist/localCheckpoint)
    {
      val bhExpr = expr(
        """transform(sequence(0, 7), b -> aggregate(sequence(b*8, b*8+7), 0L,
          | (acc, j) -> acc ^ ((element_at(sig, j+1) * 131 + j) % 1000000007)))"""
          .stripMargin)
      val feat = reps
        .select(col("doc_id"),
          GraftBridge.column(graft.functions.MinhashSigExpr(
            GraftBridge.expression(col("text")), 3, 64)).as("sig"),
          GraftBridge.column(graft.functions.WordShingleModHashesExpr(
            GraftBridge.expression(col("text")), 3)).as("ps"))
        .filter(col("sig").isNotNull)
        .withColumn("bh", bhExpr)
      val bk = feat.select(col("doc_id"), col("sig"), col("ps"), col("bh"),
        posexplode(col("bh")).as(Seq("band", "band_hash")))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("band_hash")).orderBy(col("doc_id"))
      val pooled = bk.withColumn("prn", row_number().over(wB))
        .filter(col("prn") <= 256)
        .drop("prn")
      val mask = pooled.groupBy(col("doc_id"))
        .agg(bit_or(expr("shiftleft(1L, band)")).as("poolmask"))
      val packed = pooled.join(broadcast(mask), Seq("doc_id"))
        .groupBy(col("band"), col("band_hash"))
        .agg(collect_list(struct(col("doc_id").as("id"), col("sig"),
          col("ps"), col("bh"), col("poolmask"))).as("pool"))
      val scores = GraftBridge.column(graft.functions.MinhashPoolScoresExpr(
        GraftBridge.expression(col("sig_b")),
        GraftBridge.expression(col("ps_b")),
        GraftBridge.expression(col("id_b")),
        GraftBridge.expression(col("bh_b")),
        GraftBridge.expression(col("band")),
        GraftBridge.expression(col("pool"))))
      val scored = bk
        .select(col("band"), col("band_hash"), col("doc_id").as("id_b"),
          col("sig").as("sig_b"), col("ps").as("ps_b"), col("bh").as("bh_b"))
        .join(packed, Seq("band", "band_hash"))
        .select(col("id_b"), explode(scores).as("m"))
        .withColumn("id_a", col("m.id_a"))
        .withColumn("est", col("m.cnt") / lit(64.0))
        .withColumn("i", col("m.inter").cast("long"))
        .withColumn("na", col("m.na").cast("long"))
        .withColumn("nb", col("m.nb").cast("long"))
        .select(col("id_a"), col("id_b"),
          (round(col("est"), 4) + lit(0.0)).as("est_jaccard"),
          (round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4)
            + lit(0.0)).as("exact_jaccard"),
          (round(abs((round(col("est"), 4) + lit(0.0)) -
            (round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4)
              + lit(0.0))), 4) + lit(0.0)).as("abs_err"))
        .transform(QueryShape.stagedSort(_, col("id_a"), col("id_b")))
      dump("minhash_est_scoring_internal", scored)
    }

    // dedup_lsh_sweep fused windowed-counter pass (replica of the
    // truth+flags pipeline that replaced the (p, bkt) truth join —
    // compare with lsh_sweep_truth_internal_before.txt)
    {
      import spark.implicits._
      val windowW = 10
      val bhExpr = expr(
        """concat(
          |  transform(sequence(0, 15), b -> aggregate(sequence(b*4, b*4+3), 0L,
          |    (acc, j) -> acc ^ ((element_at(sig, j+1) * 131 + j) % 1000000007))),
          |  transform(sequence(0, 7), b -> aggregate(sequence(b*8, b*8+7), 0L,
          |    (acc, j) -> acc ^ ((element_at(sig, j+1) * 131 + j) % 1000000007))),
          |  transform(sequence(0, 3), b -> aggregate(sequence(b*16, b*16+15), 0L,
          |    (acc, j) -> acc ^ ((element_at(sig, j+1) * 131 + j) % 1000000007))))"""
          .stripMargin)
      val feat = reps
        .select(col("doc_id"),
          GraftBridge.column(graft.functions.MinhashSigExpr(
            GraftBridge.expression(col("text")), 3, 64)).as("sig"),
          GraftBridge.column(graft.functions.WordShingleModHashesExpr(
            GraftBridge.expression(col("text")), 3)).as("ps"))
        .filter(col("sig").isNotNull)
      val B = 1L << 14
      val docFrame = feat
        .withColumn("bh", bhExpr)
        .select(col("doc_id"), col("ps"), col("bh"))
        .withColumn("bk", (col("doc_id") / lit(B)).cast("long"))
        .withColumn("cp", lit(false))
      val lookahead = docFrame
        .filter(pmod(col("doc_id"), lit(B)) < windowW && col("bk") > 0)
        .withColumn("bk", col("bk") - 1)
        .withColumn("cp", lit(true))
      val counters = docFrame.unionByName(lookahead)
        .select(col("bk"), col("doc_id"), col("ps"), col("bh"), col("cp"))
        .repartition(col("bk"))
        .sortWithinPartitions(col("bk"), col("doc_id"))
        .as[(Long, Long, Array[Long], Array[Long], Boolean)]
        .mapPartitions { _ => Iterator.empty[(Long, Long, Long, Long, Long, Long, Long)] }
        .toDF("wc4", "wc8", "wc16", "tf4", "tf8", "tf16", "ntrue")
        .agg(sum("wc4"), sum("wc8"), sum("wc16"),
          sum("tf4"), sum("tf8"), sum("tf16"), sum("ntrue"))
      dump("lsh_sweep_truth_internal", counters)
    }

    // one grouped BPE training round (replica of trainGrouped's
    // per-round winner job — compare against the four per-language
    // chains: the group key now rides one aggregate)
    {
      val docWords = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), explode(expr(
          "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '' AND length(x) >= 2)"))
          .as("word"))
        .withColumn("pred_lang", lit("en")) // plan shape only
      val typeCounts = docWords
        .groupBy(col("pred_lang"), col("word")).agg(count(lit(1)).as("cnt"))
      val words = typeCounts.withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .select(col("pred_lang").as("__grp"), col("word"), col("cnt"), col("toks"))
      val pairExpr = expr(
        """transform(sequence(1, size(toks) - 1),
          | i -> struct(element_at(toks, i) AS pa, element_at(toks, i + 1) AS pb))""".stripMargin)
      val best = words.filter(size(col("toks")) >= 2)
        .select(col("__grp"), col("cnt"), explode(pairExpr).as("p"))
        .groupBy(col("__grp"), col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("cnt")).as("weight"))
        .groupBy(col("__grp"))
        .agg(min(struct((col("weight") * lit(-1L)).as("nw"),
          col("pa"), col("pb"))).as("b"))
        .select(col("__grp"), col("b.pa"), col("b.pb"),
          (col("b.nw") * lit(-1L)).as("weight"))
      dump("bpe_grouped_round_internal", best)
    }

    spark.stop()
  }
}

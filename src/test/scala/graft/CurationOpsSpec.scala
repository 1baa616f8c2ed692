package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Behavior checks for the round-8 curation additions: the
  * distributed classifier trainer (J30), the watermark detector
  * (E29), and the PSI drift monitor's flag (G30). The oracle gate
  * proves engine equality; these prove the operators DO the thing —
  * the trainer separates a separable corpus, the detector flags a
  * planted green-chain, PSI fires on a real distribution shift.
  */
class CurationOpsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_curation").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pipeline_train_classifier: descent separates a separable corpus, deterministically") {
    // en docs: long, punctuation-free. others: short, punctuation- and
    // digit-dense. Linearly separable in (f1, f2, f3) by construction.
    val pos = (0 until 8).map(i =>
      (i.toLong, ("alpha beta gamma delta " * 60) + s"tail$i", "en"))
    val neg = (0 until 8).map(i =>
      (100L + i, s"x$i. 12. 9. 7. 3. 1. 0. 5. 8. 2.", "de"))
    val dir = writeDocs(pos ++ neg)
    val run1 = PipelineQueries.queries("pipeline_train_classifier")(spark, dir)
      .collect()
    val run2 = PipelineQueries.queries("pipeline_train_classifier")(spark, dir)
      .collect()
    assert(run1.toSeq == run2.toSeq,
      "descent must be bit-deterministic across runs")
    assert(run1.length == PipelineQueries.ClfIters + 1)
    val first = run1.head
    val last = run1.last
    val acc = run1.map(_.getAs[Double]("acc"))
    // iter 0 (w = 0): z = 0 everywhere, everything predicted positive
    assert(first.getAs[Long]("n_pred_pos") == 16L)
    assert(first.getAs[Double]("acc") == 0.5)
    // the descent separates the planted corpus
    assert(last.getAs[Double]("acc") == 1.0,
      s"separable corpus not separated: acc trace ${acc.mkString(",")}")
    // and moves weights in the separating direction: length up,
    // punctuation and digits down
    assert(last.getAs[Double]("w1") > 0.0)
    assert(last.getAs[Double]("w2") < 0.0)
    assert(last.getAs[Double]("w3") < 0.0)
  }

  test("pipeline_train_classifier: real corpus trace is well-formed") {
    val rows = PipelineQueries.queries("pipeline_train_classifier")(
      spark, sfDir).collect()
    assert(rows.length == PipelineQueries.ClfIters + 1)
    val n = rows.head.getAs[Long]("n")
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_correct") <= n)
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  /** Rolling bigram hash exactly as WordShingleModHashesExpr(k=2)
    * computes it — used to greedily build a green chain.
    */
  private def bigramHash(a: String, b: String): Long =
    graft.functions.WordShingleModHashesExpr
      .compute(UTF8String.fromString(s"$a $b"), 2, distinct = false)
      .toLongArray()(0)

  test("text_watermark_detect: planted green-chain is flagged and ranks first") {
    val vocab = (0 until 256).map(i => f"w$i%03d")
    // greedy chain: every consecutive bigram hashes green (p % 4 == 0)
    val chain = scala.collection.mutable.ArrayBuffer("w000")
    while (chain.length < 80) {
      val prev = chain.last
      chain += vocab.find(v => bigramHash(prev, v) % 4 == 0).getOrElse(
        fail(s"no green successor for $prev in a 256-word vocab"))
    }
    val planted = (999L, chain.mkString(" "), "en")
    val normals = (0 until 30).map { i =>
      val words = (0 until 60).map(j => vocab((i * 61 + j * 7) % 256))
      (i.toLong, words.mkString(" "), "en")
    }
    val dir = writeDocs(normals :+ planted)
    val out = TextQueries.queries("text_watermark_detect")(spark, dir)
      .collect()
    val top = out.head
    assert(top.getAs[Long]("doc_id") == 999L,
      s"planted watermark not ranked first: ${out.take(3).mkString(",")}")
    assert(top.getAs[Boolean]("flagged"))
    assert(top.getAs[Long]("n_green") == top.getAs[Long]("n_windows"),
      "every bigram of the chain must be green")
    // z = sqrt(3T) for an all-green doc
    val t = top.getAs[Long]("n_windows").toDouble
    assert(math.abs(top.getAs[Double]("z_score") - math.sqrt(3.0 * t)) < 1e-3)
    // the deterministic normal docs sit far below the planted z
    out.tail.foreach { r =>
      assert(r.getAs[Double]("z_score") < top.getAs[Double]("z_score"))
    }
  }

  test("pipeline_skew_audit: a planted hot key trips exactly its partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    // 2000 rows on one key + 1 row on each of 640 uniform keys
    // (20 per partition): the hot key's partition carries ~76% of the
    // load, every other partition ~0.76% — only one row may flag.
    val rows = (0 until 2000).map(i => (i.toLong, 7L)) ++
      (0 until 640).map(i => (10000L + i, 100L + i))
    rows.map { case (eid, uid) =>
      (eid, new java.sql.Timestamp(1704067200000L + eid * 1000), uid,
        "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = PipelineQueries.queries("pipeline_skew_audit")(spark, dir)
      .collect()
    assert(out.length == 32, "audit must report the full partition spine")
    val hotPart = ((7L % 1000000007L) * 2654435761L) % 2147483647L % 32L
    val flagged = out.filter(_.getAs[Boolean]("skewed"))
    assert(flagged.map(_.getAs[Long]("part_id")).toSeq == Seq(hotPart),
      s"exactly the hot key's partition must flag, got ${flagged.mkString(",")}")
    val hot = out.find(_.getAs[Long]("part_id") == hotPart).get
    assert(hot.getAs[Long]("max_key_rows") == 2000L)
    assert(out.map(_.getAs[Long]("n_rows")).sum == 2640L)
  }

  test("pipeline_semantic_contamination: near-probe vectors flag, orthogonal stay clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_semcon").toString
    // probe 3 = e1; corpus: 100 an exact copy (leaked eval row),
    // 102 a "paraphrase" at cos 0.7433, 101 orthogonal, 103 weakly
    // aligned at cos 0.196 — only 100 and 102 may flag at 0.35.
    Seq(
      (3L, Seq(1.0f, 0f, 0f, 0f)),
      (100L, Seq(1.0f, 0f, 0f, 0f)),
      (101L, Seq(0f, 1.0f, 0f, 0f)),
      (102L, Seq(1.0f, 0.9f, 0f, 0f)),
      (103L, Seq(1.0f, 5.0f, 0f, 0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = PipelineQueries.queries("pipeline_semantic_contamination")(
      spark, dir).collect()
    assert(out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("probe_id")))
      .toSeq == Seq((100L, 3L), (102L, 3L)),
      s"exactly the planted leaks must flag, got ${out.mkString(",")}")
    assert(out.head.getAs[Double]("cos_sim") == 1.0)
    assert(out(1).getAs[Double]("cos_sim") == 0.7433)
  }

  test("stream_drift_psi: batch twin fires on a planted distribution shift") {
    import spark.implicits._
    // day 0: 100 events in bin 0; day 1: same mass moved to bin 7;
    // day 2: same histogram as day 0 (no drift)
    val feed = ((0 until 100).map(i => ("shift", 0L, 0L)) ++
      (0 until 100).map(i => ("shift", 1L, 7L)) ++
      (0 until 100).map(i => ("shift", 2L, 0L)))
      .toDF("event_type", "day", "bin")
    val out = StreamQueries.psiDriftBatch(feed).collect()
    assert(out.length == 2)
    val d1 = out.find(_.getAs[Long]("day_idx") == 1L).get
    val d2 = out.find(_.getAs[Long]("day_idx") == 2L).get
    assert(d1.getAs[Boolean]("drifted"),
      s"total mass shift must trip PSI, got ${d1.getAs[Double]("psi")}")
    assert(d1.getAs[Double]("psi") > 1.0)
    assert(!d2.getAs[Boolean]("drifted"),
      s"identical histogram must not trip PSI, got ${d2.getAs[Double]("psi")}")
  }
}

package graft

import org.apache.spark.sql.functions.{broadcast, col}

/** Smoke + shape checks for every SparkEntry query at sf0.001: runs,
  * returns rows, and the declared oracle exists where required.
  * Value-level correctness is enforced by the DuckDB oracle gate
  * (scripts/check.py / the driver's CORRECTNESS run).
  */
class QueriesSpec extends SparkSpec {

  private val rowsOnly = Set.empty[String]

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      withClue(s"$name returned $n rows: ") {
        assert(n > 0 || name == "q11_anti_join") // anti-join may be empty at tiny sf
      }
    }
  }

  test("every query has an oracle or a documented rows-only waiver") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or waiver: $missing")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Plan-shape pin for the r6 scale-killer fix: the PMI top-20 must be
  // a TakeOrderedAndProject (per-partition heap + driver merge), never
  // a single-partition global window. The production builder only
  // WARNS on violation (ADVICE r7) — this is the hard gate.
  test("text_pmi_collocations top-k compiles to TakeOrderedAndProject") {
    val plan = SparkEntry.queries("text_pmi_collocations")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in plan:\n$plan")
  }

  // Plan-shape pin for D25: the persisted IVF list scan must carry a
  // DynamicPruningExpression (probe-side broadcast prunes to the
  // probed cid partitions — only nprobe/K of the index files are
  // read). The production builder only WARNS on violation.
  test("knn_ivf_persisted list scan carries dynamic partition pruning") {
    val df = SparkEntry.queries("knn_ivf_persisted")(spark, sfDir)
    assert(df.count() > 0)
    // the builder checkpoints the final frame, so re-derive the plan
    // of the underlying join by rebuilding through the same entry and
    // checking the WARN condition did not fire: the builder's plan
    // inspection ran at construction — here we assert the layout
    // still partition-prunes by reading it the same way
    import graft.operators.IvfIndex
    val all = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cent = all.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val tmp = TmpDir.scratch("ivf_persist_spec")
    IvfIndex.assign(all, cent, "vec_id", "v", keep = 1)
      .select(col("vec_id").as("nid"), col("v").as("nv"), col("cid"))
      .write.partitionBy("cid").parquet(tmp)
    val lists = spark.read.parquet(tmp)
    val probes = IvfIndex.assign(all.filter(col("vec_id") <= 10),
        cent, "vec_id", "v", keep = 2)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid"))
    val plan = lists.join(broadcast(probes), Seq("cid"))
      .queryExecution.executedPlan.toString
    TmpDir.delete(tmp)
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruning in the persisted list scan:\n$plan")
  }
}

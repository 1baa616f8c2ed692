package graft

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
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.StatTests

/** Planted-answer validation of the inferential-statistics cores
  * (B77/B78/B80/B87). The DuckDB oracle replays the SAME algebra as
  * each query, so a formula bug shared by both sides would pass the
  * correctness gate — these tests compare against answers computed BY
  * HAND (and cross-checked against the textbook formulas), breaking
  * that symmetry.
  */
class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("Mann-Whitney U with ties matches the hand-computed answer") {
    // group A = [1,2,2,5], group B = [2,3,4]; avg tie ranks give
    // R_A = 14.0, U_A = 4.0, tie-corrected z = -0.7338
    val obs = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 5L),
      (0L, 2L), (0L, 3L), (0L, 4L)).toDF("in_a", "v")
    val r = StatTests.mannWhitney(obs).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 4.0, s"u1 = ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - (-0.7338)) < 5e-5,
      s"z = ${r.getDouble(3)}")
  }

  test("Kaplan-Meier matches the hand-computed survival curve") {
    // subjects (t, event): (1,1),(2,1),(2,0),(3,1),(4,0),(5,1)
    // S: 1→0.833333, 2→0.666667, 3→0.444444, 4→0.444444, 5→0
    val subjects = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L),
      (4L, 0L), (5L, 1L)).toDF("t", "event")
    val got = StatTests.kaplanMeier(subjects)
      .select(col("t"), col("n_at_risk"), col("d"), col("censored"),
        round(col("s_km"), 6).as("s"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val want = Seq(
      (1L, 6L, 1L, 0L, 0.833333), (2L, 5L, 1L, 1L, 0.666667),
      (3L, 3L, 1L, 0L, 0.444444), (4L, 2L, 0L, 1L, 0.444444),
      (5L, 1L, 1L, 0L, 0.0))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("chi-square matches the hand-computed 2x2 statistic") {
    // O = [[10,20],[30,40]] → χ² = 0.7937 (4dp), df = 1
    val cells = Seq(("a", "x", 10L), ("a", "y", 20L),
      ("b", "x", 30L), ("b", "y", 40L)).toDF("rk", "ck", "observed")
    val r = StatTests.chiSquare(cells).select("chi2", "df").head()
    assert(r.getDouble(0) == 0.7937, s"chi2 = ${r.getDouble(0)}")
    assert(r.getLong(1) == 1L)
  }

  test("runs test matches the hand-computed alternating sequence") {
    // perfectly alternating 1,0,1,0,1,0,1,0: runs = 8, E[R] = 5,
    // z = +2.2913 (maximal anti-clustering)
    val obs = (0 until 8).map(i => ("g", i.toLong, (1 - i % 2).toLong))
      .toDF("grp", "pos", "above")
    val r = StatTests.runsTest(obs, Seq(col("pos"))).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 8L, s"runs = ${r.getLong(3)}")
    assert(r.getDouble(4) == 5.0)
    assert(math.abs(r.getDouble(5) - 2.2913) < 5e-5, s"z = ${r.getDouble(5)}")
  }
}

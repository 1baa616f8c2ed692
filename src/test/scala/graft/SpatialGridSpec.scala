package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialGrid

/** SpatialGrid.neighborPairs: exact parity with the all-pairs brute
  * force (the grid is a broad phase, not an approximation), no
  * duplicate pairs from the half-neighborhood replicate, and boundary
  * cases (points exactly at radius, on cell edges, negative
  * coordinates).
  */
class SpatialGridSpec extends SparkSpec {

  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)], r: Double) =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  private def grid(pts: Seq[(Long, Double, Double)], r: Double) =
    SpatialGrid
      .neighborPairs(pts.toDF("id", "x", "y"), col("id"), col("x"), col("y"), r)
      .as[(Long, Long, Double)].collect()

  test("matches brute force on a seeded random cloud, several radii") {
    val rnd = new scala.util.Random(42)
    val pts = (0L until 300L).map(i =>
      (i, rnd.nextInt(200).toDouble, rnd.nextInt(200).toDouble))
    for (r <- Seq(5.0, 17.0, 60.0)) {
      val got = grid(pts, r)
      assert(got.length == got.toSet.size, s"duplicate pairs at r=$r")
      assert(got.toSet == brute(pts, r), s"pair set mismatch at r=$r")
    }
  }

  test("boundary: pair exactly at radius kept, just beyond dropped") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 10.0, 0.0), (3L, 0.0, 10.5))
    val got = grid(pts, 10.0)
    assert(got.toSet == Set((1L, 2L, 100.0)))
  }

  test("negative coordinates and cell-edge points") {
    // straddles cell boundaries at multiples of r=4 incl. negatives
    val pts = Seq((1L, -4.0, 0.0), (2L, -0.5, 0.0), (3L, 0.0, 0.0),
      (4L, 4.0, 0.0), (5L, -8.0, -8.0))
    val got = grid(pts, 4.0)
    assert(got.toSet == brute(pts, 4.0))
  }

  test("scale probe: 200k lattice points, closed-form pair count, no quadratic blowup") {
    // points at (10·i, 0): every consecutive pair is at distance
    // exactly r (kept, ≤), every other pair ≥ 2r (dropped) — so the
    // answer is exactly n−1 pairs. An all-pairs formulation would be
    // 2·10^10 candidates; the grid must finish this in seconds by
    // generating O(n) candidates.
    val n = 200000
    val pts = spark.range(n.toLong)
      .select(col("id"), (col("id") * 10).cast("double").as("x"),
        lit(0.0).as("y"))
    val pairs = SpatialGrid.neighborPairs(pts, col("id"), col("x"), col("y"), 10.0)
    val agg = pairs.agg(count(lit(1)), sum(col("dist2"))).head()
    assert(agg.getLong(0) == (n - 1).toLong)
    assert(agg.getDouble(1) == (n - 1).toDouble * 100.0)
  }

  test("a point is never paired with itself") {
    val pts = Seq((1L, 1.0, 1.0), (2L, 1.0, 1.0)) // co-located distinct ids
    val got = grid(pts, 3.0)
    assert(got.toSet == Set((1L, 2L, 0.0)))
  }

  test("neighborSums matches brute-force sums on a seeded random cloud") {
    // integer-valued coordinates/velocities → sums are order-exact,
    // so set equality (not tolerance) is the right assertion
    val rnd = new scala.util.Random(7)
    val pts = (0L until 400L).map(i =>
      (i, rnd.nextInt(150).toDouble, rnd.nextInt(150).toDouble,
        rnd.nextInt(21).toDouble - 10.0, rnd.nextInt(21).toDouble - 10.0))
    for (r <- Seq(6.0, 25.0)) {
      val want = (for {
        (ia, xa, ya, _, _) <- pts
        nbs = pts.filter { case (ib, xb, yb, _, _) =>
          ib != ia &&
            (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= r * r
        }
        if nbs.nonEmpty
      } yield (ia, nbs.size.toLong, nbs.map(_._2).sum, nbs.map(_._3).sum,
        nbs.map(_._4).sum, nbs.map(_._5).sum)).toSet
      val got = SpatialGrid.neighborSums(
          pts.toDF("id", "x", "y", "vx", "vy"),
          col("id"), col("x"), col("y"), col("vx"), col("vy"), r)
        .as[(Long, Long, Double, Double, Double, Double)].collect().toSet
      assert(got == want, s"neighbor-sum mismatch at r=$r")
    }
  }

  test("neighborSums: isolated point emits no row; co-located ids exclude self") {
    val pts = Seq((1L, 0.0, 0.0, 1.0, 2.0), (2L, 0.0, 0.0, 3.0, 4.0),
      (3L, 100.0, 100.0, 5.0, 6.0))
    val got = SpatialGrid.neighborSums(
        pts.toDF("id", "x", "y", "vx", "vy"),
        col("id"), col("x"), col("y"), col("vx"), col("vy"), 5.0)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0.0, 0.0, 3.0, 4.0),
      (2L, 1L, 0.0, 0.0, 1.0, 2.0)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed radius search (spatial hash broad phase): all pairs
  * of points within `radius`, without the all-pairs join.
  *
  * Points land in square cells of side `radius`; any pair within the
  * radius is then in the same or an adjacent cell, so candidate
  * generation is an equi-join on cell coordinates — the shuffle is on
  * cell, volume O(points + true near-pairs), never O(n²). The left
  * side replicates to the HALF neighborhood only (same cell, E, NW,
  * N, NE): each unordered adjacent-cell pair is generated exactly
  * once, halving the join volume vs the naive 9-cell replicate; the
  * same-cell case dedups on id order instead. This is the collision
  * broad phase of a physics/flocking engine (reference scope:
  * archetype/world.py per-entity processors) expressed as one
  * shuffle — the shape that survives a 1000-executor corpus.
  *
  * Degenerate density (all points in one cell) degrades to the
  * quadratic in-cell join — callers pick `radius` ≪ extent, or
  * pre-salt hot cells; AQE's skew split covers moderate hot cells.
  */
object SpatialGrid {

  /** Pairs (id_a < id_b, dist2) with dist2 = squared euclidean
    * distance ≤ radius². Ids must be non-null and unique; x/y finite
    * doubles. dist2 is exact when coordinates are integer-valued
    * doubles (products stay < 2^53), which is what the oracle relies
    * on.
    */
  def neighborPairs(points: DataFrame, id: Column, x: Column, y: Column,
      radius: Double): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val pts = points.select(id.as("id"), x.as("x"), y.as("y"))
      .withColumn("cx", floor(col("x") / radius).cast("long"))
      .withColumn("cy", floor(col("y") / radius).cast("long"))
    // forward half-neighborhood: exactly one of {d, -d} per direction
    val offsets = Seq((0L, 0L), (1L, 0L), (-1L, 1L), (0L, 1L), (1L, 1L))
    val left = pts.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), col("cx"), col("cy"),
        explode(array(offsets.map { case (dx, dy) =>
          struct((col("cx") + dx).as("jx"), (col("cy") + dy).as("jy"),
            lit(dx == 0 && dy == 0).as("same"))
        }: _*)).as("cell"))
      .select(col("id_a"), col("xa"), col("ya"), col("cell.jx"),
        col("cell.jy"), col("cell.same"))
    val right = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    left.join(right, Seq("jx", "jy"))
      .filter(!col("same") || col("id_a") < col("id_b"))
      .filter(d2 <= radius * radius)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        d2.as("dist2"))
  }
}

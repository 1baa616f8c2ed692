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
  /** Per-point neighbor sums (count + Σx + Σy + Σvx + Σvy over all
    * OTHER points within `radius`) without materializing the pair
    * set. The flocking step needs only these sums, and in a
    * fixed-extent box the true pair count grows quadratically with
    * density — 15M entities at sf100 made ~20G pairs, which killed
    * the pair-join on disk. Here cells pack into one pool row each
    * (collect_list), pools join their 9-cell block pool-to-pool
    * (O(cells·9) rows of ~cell-size arrays), and
    * GridNeighborSumsExpr scans center x neighbor IN-TASK, emitting
    * one partial per center point; the 9 partials of a cell collapse
    * map-side in the final groupBy (same join key → same partition),
    * so the only O(points)-scale shuffles carry ~50 B rows. The
    * quadratic term is pure CPU — the shape that survives a decade-up.
    * Sums are exact when coordinates/velocities are integer-valued
    * doubles (the oracle's replay condition, as for neighborPairs).
    */
  def neighborSums(points: DataFrame, id: Column, x: Column, y: Column,
      vx: Column, vy: Column, radius: Double): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val pts = points.select(id.as("id"), x.as("x"), y.as("y"),
        vx.as("vx"), vy.as("vy"))
      .withColumn("cx", floor(col("x") / radius).cast("long"))
      .withColumn("cy", floor(col("y") / radius).cast("long"))
    val pools = pts.groupBy(col("cx"), col("cy"))
      .agg(collect_list(struct(col("id"), col("x"), col("y"),
        col("vx"), col("vy"))).as("pool"))
    val offsets = for (dx <- -1L to 1L; dy <- -1L to 1L) yield (dx, dy)
    val nbr = pools.select(col("pool").as("npool"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
      }: _*)).as("cell"))
      .select(col("cell.cx"), col("cell.cy"), col("npool"))
    val partial = pools.join(nbr, Seq("cx", "cy"))
      .select(explode(org.apache.spark.sql.GraftBridge.column(
        graft.functions.GridNeighborSumsExpr(
          org.apache.spark.sql.GraftBridge.expression(col("pool")),
          org.apache.spark.sql.GraftBridge.expression(col("npool")),
          radius * radius))).as("p"))
    partial.groupBy(col("p.id").as("id"))
      .agg(sum(col("p.n")).as("n_nb"),
        sum(col("p.sx")).as("sx"), sum(col("p.sy")).as("sy"),
        sum(col("p.svx")).as("svx"), sum(col("p.svy")).as("svy"))
  }

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

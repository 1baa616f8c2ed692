package graft

import graft.ecs._
import graft.EcsQueries.{MovementProcessor, PosVel}
import org.apache.spark.sql.functions._

/** Scale probe for the ECS engine: a 100k-entity world stepped through
  * the fully distributed path (spawnBatch → merge-on-read queries →
  * append upserts → periodic compaction), verified against the
  * closed-form trajectory for EVERY entity. 100× the r1 bench's
  * entity count per step; the structures exercised (window-resolved
  * state over a growing append log, archetype-pruned queries) are the
  * ones that carry to 1000-executor scale.
  */
class EcsScaleSpec extends SparkSpec {

  test("100k entities x 4 steps: every trajectory matches closed form") {
    val world = World.make(spark, "sim_scale", "run_scale", optimizeInterval = 2)
    world.addProcessor(MovementProcessor)
    val n = 100000L
    val seed = spark.range(n).select(
      col("id").as("entity_id"),
      (col("id") % 100).cast("double").as("position__x"),
      lit(0.0).as("position__y"),
      lit(1.5).as("velocity__vx"),
      ((col("id") % 3) - 1).cast("double").as("velocity__vy"))
    world.spawnBatch(PosVel, seed)
    val t0 = System.nanoTime()
    (1 to 4).foreach(_ => world.step(0.5))
    val state = world.query(PosVel).values.head
    // x = id%100 + 4·0.5·1.5 = id%100 + 3.0 ; y = 4·0.5·((id%3)−1)
    val bad = state.filter(
      col("position__x") =!= (col("entity_id") % 100).cast("double") + 3.0 ||
        col("position__y") =!= ((col("entity_id") % 3) - 1).cast("double") * 2.0)
      .count()
    val rows = state.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"100k entities x 4 steps + full verify: $secs%.1f s")
    assert(bad == 0L, s"$bad entities deviated from the closed-form trajectory")
    assert(rows == n)
  }
}

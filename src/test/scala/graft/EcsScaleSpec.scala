package graft

import graft.ecs._
import graft.EcsQueries.{MovementProcessor, PosVel}
import org.apache.spark.sql.functions._

/** Scale probe for the ECS engine: 100k- and 1M-entity worlds stepped
  * through the fully distributed path (spawnBatch → merge-on-read
  * queries → append upserts → periodic compaction), verified against
  * the closed-form trajectory for EVERY entity. Per-step latency is
  * reported so rounds can track the latency-vs-entity-count curve
  * (recorded in SURVEY §6d); the structures exercised
  * (window-resolved state over a growing append log, archetype-pruned
  * queries) are the ones that carry to 1000-executor scale.
  */
class EcsScaleSpec extends SparkSpec {

  /** Returns per-step seconds; asserts every entity's closed form. */
  private def runScale(n: Long, steps: Int, optimizeInterval: Int,
      reliable: Boolean): Seq[Double] = {
    if (reliable && spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")
    val world = World.make(spark, s"sim_scale_$n", "run_scale",
      optimizeInterval = optimizeInterval, reliableCheckpoints = reliable)
    world.addProcessor(MovementProcessor)
    val seed = spark.range(n).select(
      col("id").as("entity_id"),
      (col("id") % 100).cast("double").as("position__x"),
      lit(0.0).as("position__y"),
      lit(1.5).as("velocity__vx"),
      ((col("id") % 3) - 1).cast("double").as("velocity__vy"))
    world.spawnBatch(PosVel, seed)
    val stepSecs = (1 to steps).map { _ =>
      val t0 = System.nanoTime()
      world.step(0.5)
      // steps are lazy plans until queried; materialize the frame so
      // the measured latency is real work, matching a driven engine
      world.query(PosVel).values.head.count()
      (System.nanoTime() - t0) / 1e9
    }
    val state = world.query(PosVel).values.head
    val k = steps.toDouble * 0.5
    val bad = state.filter(
      col("position__x") =!= (col("entity_id") % 100).cast("double") + k * 1.5 ||
        col("position__y") =!= ((col("entity_id") % 3) - 1).cast("double") * k)
      .count()
    assert(bad == 0L, s"$bad of $n entities deviated from closed form")
    assert(state.count() == n)
    stepSecs
  }

  test("100k entities x 4 steps: every trajectory matches closed form") {
    val secs = runScale(100000L, steps = 4, optimizeInterval = 2,
      reliable = false)
    info(f"100k per-step seconds: ${secs.map(s => f"$s%.1f").mkString(", ")}")
  }

  test("1M entities x 4 steps, reliable checkpoints: closed form holds") {
    val secs = runScale(1000000L, steps = 4, optimizeInterval = 2,
      reliable = true)
    info(f"1M per-step seconds: ${secs.map(s => f"$s%.1f").mkString(", ")}")
    // step latency must stay bounded — compaction every 2 steps keeps
    // the resolved-window input from accumulating across the run
    assert(secs.max < 120.0,
      f"a 1M-entity step took ${secs.max}%.1f s — compaction is not holding")
  }
}

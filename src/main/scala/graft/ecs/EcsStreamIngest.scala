package graft.ecs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion bridge: a live event stream drives `World`
  * state, the reference's external `step` loop re-expressed as
  * Structured Streaming `foreachBatch`
  * (reference: archetype/core/world.py:23-33 — the engine is built to
  * be *driven*; this is the driver).
  *
  * Each micro-batch folds into the world as one simulation step:
  * aggregate the batch per user, full-outer-merge with the current
  * live state, commit at `currentStep + 1`. Entities spawned from the
  * stream use `entity_id = user_id` — the external key IS the entity
  * identity, the scalable idiom for bulk ingestion (a driver-side
  * id counter would serialize 100 TB of spawns through one process).
  *
  * Scale shape: per batch, one shuffle to aggregate the delta and one
  * keyed outer join against the live state — no driver-side rows, no
  * collect. State growth is bounded by the archetype store's
  * merge-on-read + periodic `optimize()` compaction.
  */
object EcsStreamIngest {

  /** Per-user running totals accumulated from the event stream. */
  final case class UserScore(user_id: Long, total: Double, n_events: Long)
      extends Component

  val meta: ComponentMeta = ComponentMeta.of[UserScore]
  private val P = meta.prefix // "userscore__"

  /** Current live (user_id, total, n_events, entity_id) state. */
  def liveState(world: World): Option[DataFrame] =
    world.query(Seq(meta)).values.reduceOption(_ unionByName _)
      .map(_.select(col("entity_id"), col(s"${P}user_id").as("user_id"),
        col(s"${P}total").as("total"), col(s"${P}n_events").as("n_events")))

  /** Fold one micro-batch of raw events (`user_id`, `value` columns)
    * into the world as one step.
    */
  def ingestBatch(world: World, batch: DataFrame): Unit = {
    val delta = batch.groupBy(col("user_id"))
      .agg(sum(col("value")).as("d_total"), count(lit(1)).as("d_n"))
    val merged = liveState(world) match {
      case Some(cur) =>
        cur.join(delta, Seq("user_id"), "full_outer")
          .select(
            coalesce(col("entity_id"), col("user_id")).as("entity_id"),
            col("user_id"),
            (coalesce(col("total"), lit(0.0)) + coalesce(col("d_total"), lit(0.0))).as("total"),
            (coalesce(col("n_events"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_events"))
      case None =>
        delta.select(col("user_id").as("entity_id"), col("user_id"),
          col("d_total").as("total"), col("d_n").as("n_events"))
    }
    val prefixed = merged.select(col("entity_id"),
      col("user_id").as(s"${P}user_id"), col("total").as(s"${P}total"),
      col("n_events").as(s"${P}n_events"))
    world.store.spawnBatch(Seq(meta), prefixed, world.currentStep + 1)
    world.currentStep += 1
  }

  /** Attach the bridge to a streaming events DataFrame; every
    * micro-batch becomes one world step.
    */
  def attach(world: World, events: DataFrame,
      queryName: String = "ecs_ingest"): StreamingQuery =
    events.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(world, batch)
      }
      .start()
}

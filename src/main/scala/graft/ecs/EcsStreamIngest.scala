package graft.ecs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion bridge: a live event stream drives `World`
  * state, the reference's external `step` loop re-expressed as
  * Structured Streaming `foreachBatch`
  * (reference: archetype/core/world.py:23-33 — the engine is built to
  * be *driven*; this is the driver).
  *
  * Each micro-batch folds into the world as one simulation step and
  * appends rows ONLY for the entities the batch touched — per-batch
  * write cost and table growth are O(batch), not O(total state).
  * History therefore holds SPARSE frames: step k carries a row only
  * for entities updated at step k, and the live view is an
  * as-of-latest read (each entity's row at its highest step), not a
  * query at a single step. This is the same merge-on-read contract the
  * store already applies within a step (latest `_v` wins per
  * (entity, step)) lifted to the step axis; `optimize()` compaction
  * bounds the read amplification of the history scan.
  *
  * Entities spawned from the stream use `entity_id = user_id` — the
  * external key IS the entity identity, the scalable idiom for bulk
  * ingestion (a driver-side id counter would serialize 100 TB of
  * spawns through one process).
  *
  * Scale shape: per batch, one shuffle to aggregate the delta and one
  * keyed join of that (small) delta against the live view — the delta
  * side broadcasts when it fits, and only touched entities are ever
  * rewritten. No driver-side rows, no collect.
  */
object EcsStreamIngest {

  /** Per-user running totals accumulated from the event stream. */
  final case class UserScore(user_id: Long, total: Double, n_events: Long)
      extends Component

  val meta: ComponentMeta = ComponentMeta.of[UserScore]
  private val P = meta.prefix // "userscore__"

  /** Current live (user_id, total, n_events, entity_id) state: each
    * entity's frame at its highest recorded step (frames are sparse —
    * a step only has rows for entities that batch touched).
    */
  def liveState(world: World): Option[DataFrame] = liveState(world.store)

  /** Same live view over a bare store — e.g. one re-attached from the
    * durable commit log after a restart (or time-traveled to an
    * earlier commit).
    */
  def liveState(store: ArchetypeStore): Option[DataFrame] =
    store.getHistory(Seq(meta)).values.reduceOption(_ unionByName _)
      .map { hist =>
        val latest = Window.partitionBy(col("entity_id"))
          .orderBy(col("step").desc)
        hist.withColumn("_sn", row_number().over(latest))
          .filter(col("_sn") === 1 && col("is_active"))
          .select(col("entity_id"), col(s"${P}user_id").as("user_id"),
            col(s"${P}total").as("total"), col(s"${P}n_events").as("n_events"))
      }

  /** Fold one micro-batch of raw events (`user_id`, `value` columns)
    * into the world as one step, appending rows only for the users
    * present in the batch.
    */
  def ingestBatch(world: World, batch: DataFrame): Unit = {
    val delta = batch.groupBy(col("user_id"))
      .agg(sum(col("value")).as("d_total"), count(lit(1)).as("d_n"))
    // Left join FROM the delta: untouched entities never enter the
    // output, so the appended frame is exactly the batch's user set.
    val updated = liveState(world) match {
      case Some(cur) =>
        delta.join(cur, Seq("user_id"), "left_outer")
          .select(
            coalesce(col("entity_id"), col("user_id")).as("entity_id"),
            col("user_id"),
            (coalesce(col("total"), lit(0.0)) + col("d_total")).as("total"),
            (coalesce(col("n_events"), lit(0L)) + col("d_n")).as("n_events"))
      case None =>
        delta.select(col("user_id").as("entity_id"), col("user_id"),
          col("d_total").as("total"), col("d_n").as("n_events"))
    }
    val prefixed = updated.select(col("entity_id"),
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

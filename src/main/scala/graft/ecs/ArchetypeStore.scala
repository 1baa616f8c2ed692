package graft.ecs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Spark-native archetype store.
  *
  * Re-expression of the reference's LanceDB-backed `ArchetypeStore`
  * (archetype/core/store.py): one logical table per archetype with base
  * columns (simulation, run, entity_id, step, is_active) plus prefixed
  * component columns, merge-insert upsert keyed on
  * (simulation, run, entity_id, step) (store.py:250-256), soft-delete
  * despawn (store.py:160-170), subset-signature matching
  * (store.py:178-188) and full step history (store.py:219-244).
  *
  * Spark-first design, NOT a port:
  *  - Each archetype table is an append-only DataFrame carrying an
  *    internal commit-version column `_v`. Upsert = pure append
  *    (shuffle-free at write); latest-wins resolution happens at read
  *    with one window over the merge keys (merge-on-read). This is how
  *    the same semantics stay cheap on a 1000-executor cluster: writes
  *    never rewrite history, and `optimize()` compacts (materializes the
  *    resolved view and cuts lineage) — the analogue of the reference's
  *    `table.optimize()`.
  *  - Persistence is parquet partitioned by (simulation, run), so a
  *    cluster-scale store partition-prunes on exactly the keys every
  *    query filters on. `step` arrives sorted within files, so parquet
  *    min/max row-group stats prune step-range scans (the analogue of
  *    the reference's BTree index on step, store.py:103-111).
  */
final class ArchetypeStore(
    val spark: SparkSession,
    val simulation: String,
    val run: String) {

  import ArchetypeStore._

  private val sigByHash = mutable.LinkedHashMap.empty[String, Seq[ComponentMeta]]
  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]
  private val pending = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Row]]
  private val entitySig = mutable.HashMap.empty[Long, String]
  private val entityCounter = new AtomicLong(0L)
  private val commitCounter = new AtomicLong(0L)

  def signatures: Map[String, Seq[ComponentMeta]] = sigByHash.toMap

  /** Register the archetype for a signature; idempotent. */
  def ensureTable(metas: Seq[ComponentMeta]): String = {
    val hash = Archetype.hashOf(metas)
    if (!sigByHash.contains(hash)) {
      sigByHash(hash) = Archetype.signature(metas)
      val schema = withVersion(Archetype.schemaOf(metas))
      tables(hash) = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    }
    hash
  }

  // -------------------------------------------------------------------
  // Entity management (reference: store.py add_entity / remove_entity)
  // -------------------------------------------------------------------

  /** Spawn one entity from component instances; returns its id.
    * Rows are buffered and flushed in batch — one driver-side row is
    * fine for interactive use; bulk ingestion should use spawnBatch.
    */
  def addEntity(components: Seq[Component], step: Long): Long = {
    require(components.nonEmpty, "Cannot create an entity with no components")
    val metas = components.map(ComponentMeta.fromInstance)
    val sig = Archetype.signature(metas)
    val hash = ensureTable(metas)
    val entityId = entityCounter.incrementAndGet()
    // values in signature order, matching Archetype.schemaOf
    val byName = components.map(c => ComponentMeta.fromInstance(c).name -> c).toMap
    val compValues = sig.flatMap { m =>
      val inst = byName(m.name)
      (0 until inst.productArity).map(inst.productElement)
    }
    val row = Row.fromSeq(
      Seq(simulation, run, entityId, step, true) ++ compValues :+ commitCounter.incrementAndGet())
    pending.getOrElseUpdate(hash, mutable.ArrayBuffer.empty) += row
    entitySig(entityId) = hash
    entityId
  }

  /** Bulk spawn: `df` must carry `entity_id` plus the prefixed component
    * columns of `metas`. The distributed path — no driver loop.
    */
  def spawnBatch(metas: Seq[ComponentMeta], df: DataFrame, step: Long): Unit = {
    val hash = ensureTable(metas)
    val schema = Archetype.schemaOf(metas)
    val prepared = df
      .withColumn("simulation", lit(simulation))
      .withColumn("run", lit(run))
      .withColumn("step", lit(step))
      .withColumn("is_active", lit(true))
      .withColumn(VersionCol, lit(commitCounter.incrementAndGet()))
      .select(schema.fieldNames.map(col).toIndexedSeq :+ col(VersionCol): _*)
    append(hash, prepared)
  }

  /** Soft-delete: mark is_active=false for this entity at `step`
    * (reference: store.py:160-170).
    */
  def removeEntity(entityId: Long, step: Long): Unit = {
    entitySig.get(entityId).foreach { hash =>
      despawnWhere(hash, col("entity_id") === entityId && col("step") === step)
      entitySig.remove(entityId)
    }
  }

  /** Batch soft-delete on an archetype. */
  def despawnWhere(hash: String, cond: org.apache.spark.sql.Column): Unit = {
    flush()
    val scoped = cond && col("simulation") === simulation && col("run") === run
    tables(hash) = tables(hash).withColumn(
      "is_active", when(scoped, lit(false)).otherwise(col("is_active")))
  }

  // -------------------------------------------------------------------
  // Query side (reference: store.py get_archetypes / get_history)
  // -------------------------------------------------------------------

  /** Signatures whose component set is a superset of the request
    * (reference: store.py:178-188).
    */
  def matchingHashes(metas: Seq[ComponentMeta]): Seq[String] = {
    require(metas.nonEmpty, "Must request at least one component type")
    val want = metas.map(_.name).toSet
    sigByHash.collect {
      case (hash, sig) if want.subsetOf(sig.map(_.name).toSet) => hash
    }.toSeq
  }

  /** Latest-wins resolved view of one archetype, scoped to (sim, run). */
  def resolved(hash: String): DataFrame = {
    flush()
    val df = tables(hash)
      .filter(col("simulation") === simulation && col("run") === run)
    latestWins(df)
  }

  def getArchetypes(metas: Seq[ComponentMeta]): Map[String, DataFrame] =
    matchingHashes(metas).map(h => h -> resolved(h)).toMap

  /** Full step-history (all upserted states, latest per (entity, step)).
    * includeAllRuns widens the scope to every run of this simulation
    * (reference: store.py:219-244).
    */
  def getHistory(metas: Seq[ComponentMeta], includeAllRuns: Boolean = false): Map[String, DataFrame] = {
    flush()
    matchingHashes(metas).map { h =>
      val scoped =
        if (includeAllRuns) tables(h).filter(col("simulation") === simulation)
        else tables(h).filter(col("simulation") === simulation && col("run") === run)
      h -> latestWins(scoped)
    }.toMap
  }

  // -------------------------------------------------------------------
  // Update side (reference: store.py upsert / update)
  // -------------------------------------------------------------------

  /** Merge-insert keyed on (simulation, run, entity_id, step)
    * (reference: store.py:250-256): implemented as version-stamped
    * append; the read path resolves latest-wins.
    */
  def upsert(hash: String, df: DataFrame): Unit = {
    flush()
    val schema = Archetype.schemaOf(sigByHash(hash))
    val prepared = df
      .withColumn(VersionCol, lit(commitCounter.incrementAndGet()))
      .select(schema.fieldNames.map(col).toIndexedSeq :+ col(VersionCol): _*)
    append(hash, prepared)
  }

  /** Plain append (reference: store.py:258-261 `update`). */
  def appendRows(hash: String, df: DataFrame): Unit = upsert(hash, df)

  /** Compact: materialize resolved state, cut lineage (the analogue of
    * LanceDB `table.optimize()`). Call every few steps in a long loop.
    */
  def optimize(): Unit = {
    flush()
    tables.keys.toSeq.foreach { h =>
      tables(h) = tables(h).localCheckpoint(true)
    }
  }

  /** Write every archetype to parquet partitioned by (simulation, run). */
  def persist(dir: String): Unit = {
    flush()
    tables.foreach { case (hash, df) =>
      latestWins(df)
        .withColumn(VersionCol, lit(0L))
        .repartition(col("simulation"), col("run"))
        .sortWithinPartitions(col("step"), col("entity_id"))
        .write.mode("overwrite").partitionBy("simulation", "run")
        .parquet(s"$dir/$hash")
      val names = sigByHash(hash).map(_.name).mkString(",")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/$hash.sig"), names)
    }
  }

  /** Re-attach a persisted archetype table written by persist(). */
  def attach(metas: Seq[ComponentMeta], dir: String): String = {
    val hash = ensureTable(metas)
    val schema = withVersion(Archetype.schemaOf(Archetype.signature(metas)))
    val df = spark.read.parquet(s"$dir/$hash")
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    tables(hash) = df
    hash
  }

  // -------------------------------------------------------------------

  private def append(hash: String, preparedWithVersion: DataFrame): Unit = {
    flush()
    tables(hash) = tables(hash).unionByName(preparedWithVersion)
  }

  /** Materialize buffered single-row spawns into their tables. */
  def flush(): Unit = {
    pending.foreach { case (hash, rows) =>
      if (rows.nonEmpty) {
        val schema = withVersion(Archetype.schemaOf(sigByHash(hash)))
        val df = spark.createDataFrame(rows.toSeq.asJava, schema)
        tables(hash) = tables(hash).unionByName(df)
        rows.clear()
      }
    }
  }
}

object ArchetypeStore {
  val VersionCol = "_v"
  val MergeKeys: Seq[String] = Seq("simulation", "run", "entity_id", "step")

  private def withVersion(s: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(
      s.fields :+ org.apache.spark.sql.types.StructField(
        VersionCol, org.apache.spark.sql.types.LongType, nullable = false))

  /** Latest committed version per (simulation, run, entity_id, step). */
  def latestWins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(MergeKeys.map(col): _*).orderBy(col(VersionCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", VersionCol)
  }
}

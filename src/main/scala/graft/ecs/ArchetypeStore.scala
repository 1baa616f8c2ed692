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
  private val checkpointed = mutable.HashMap.empty[String, DataFrame]
  // durable-persistence watermarks: highest _v already on disk and the
  // next commit directory index, per archetype
  private val durableMaxV = mutable.HashMap.empty[String, Long]
  private val nextCommit = mutable.HashMap.empty[String, Long]

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

  /** Batch soft-delete on an archetype: APPENDS tombstone rows
    * (matching rows re-stamped `is_active = false` under a fresh
    * version) rather than rewriting history in place — latest-wins
    * resolves them identically, and the append-only contract is what
    * lets `commitDelta` persist despawns incrementally.
    */
  def despawnWhere(hash: String, cond: org.apache.spark.sql.Column): Unit = {
    flush()
    val scoped = cond && col("simulation") === simulation && col("run") === run
    val tombstones = ArchetypeStore.latestWinsKeepVersion(tables(hash).filter(scoped))
      .withColumn("is_active", lit(false))
      .withColumn(VersionCol, lit(commitCounter.incrementAndGet()))
    tables(hash) = tables(hash).unionByName(tombstones)
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
    * The previous compaction's checkpoint blocks are released once the
    * new one materializes, so long simulations hold at most one
    * snapshot per archetype.
    */
  def optimize(): Unit = {
    flush()
    tables.keys.toSeq.foreach { h =>
      val old = checkpointed.get(h)
      tables(h) = tables(h).localCheckpoint(true)
      checkpointed(h) = tables(h)
      old.foreach(o => org.apache.spark.sql.GraftBridge.checkpointRdd(o)
        .foreach(_.unpersist(false)))
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

  // -------------------------------------------------------------------
  // Durable incremental persistence (r2): append-only parquet commits.
  //
  // Layout: `$dir/$hash/commit=<n>/simulation=…/run=…/*.parquet` — each
  // commitDelta writes ONLY rows versioned after the previous commit as
  // a new `commit=<n>` partition (parquet append mode; nothing is
  // rewritten). compact() folds every live commit into one base commit
  // and advances the `_base` marker file, so readers scan
  // `commit >= base` — the simplified Delta-style log that makes a
  // 100 TB store persist O(delta) per commit instead of O(table).
  // Old commit directories below the base are dead and can be vacuumed
  // out-of-band.
  // -------------------------------------------------------------------

  private def baseMarkerPath(dir: String, hash: String) =
    java.nio.file.Paths.get(s"$dir/$hash/_base")

  private def readBase(dir: String, hash: String): Long = {
    val p = baseMarkerPath(dir, hash)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim.toLong
    else 0L
  }

  /** Durably append rows not yet committed; O(delta), no rewrite. */
  def commitDelta(dir: String): Unit = {
    flush()
    tables.foreach { case (hash, df) =>
      val lastV = durableMaxV.getOrElse(hash, -1L)
      val highV = commitCounter.get()
      val n = nextCommit.getOrElse(hash, readBase(dir, hash))
      df.filter(col(VersionCol) > lastV)
        .withColumn("commit", lit(n))
        .repartition(col("simulation"), col("run"))
        .sortWithinPartitions(col("step"), col("entity_id"))
        .write.mode("append")
        .partitionBy("commit", "simulation", "run")
        .parquet(s"$dir/$hash")
      val names = sigByHash(hash).map(_.name).mkString(",")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/$hash.sig"), names)
      durableMaxV(hash) = highV
      nextCommit(hash) = n + 1
    }
  }

  /** Fold all live commits into one base commit (latest-wins resolved,
    * versions preserved) and advance the `_base` marker. The analogue
    * of log-structured compaction; run periodically, not per commit.
    */
  def compactDurable(dir: String): Unit = {
    sigByHash.keys.foreach { hash =>
      val path = s"$dir/$hash"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        val base = readBase(dir, hash)
        val live = spark.read.parquet(path).filter(col("commit") >= base)
        val n = nextCommit.getOrElse(hash, base + 1)
        latestWinsKeepVersion(live.drop("commit"))
          .withColumn("commit", lit(n))
          .repartition(col("simulation"), col("run"))
          .sortWithinPartitions(col("step"), col("entity_id"))
          .write.mode("append")
          .partitionBy("commit", "simulation", "run")
          .parquet(path)
        java.nio.file.Files.writeString(baseMarkerPath(dir, hash), n.toString)
        nextCommit(hash) = n + 1
      }
    }
  }

  /** Attach a durable store written by commitDelta/compactDurable: the
    * in-memory table reads live commits lazily; counters resume past
    * the durable high-water marks.
    */
  def attachDurable(metas: Seq[ComponentMeta], dir: String): String = {
    val hash = ensureTable(metas)
    val base = readBase(dir, hash)
    val schema = withVersion(Archetype.schemaOf(Archetype.signature(metas)))
    val all = spark.read.parquet(s"$dir/$hash")
    val live = all.filter(col("commit") >= base)
    tables(hash) = live.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val marks = all.agg(max(col("commit").cast("long")),
      max(col(VersionCol)), max(col("entity_id"))).head()
    val maxCommit = if (marks.isNullAt(0)) base else marks.getLong(0)
    val maxV = if (marks.isNullAt(1)) 0L else marks.getLong(1)
    val maxId = if (marks.isNullAt(2)) 0L else marks.getLong(2)
    nextCommit(hash) = maxCommit + 1
    durableMaxV(hash) = maxV
    commitCounter.updateAndGet(v => math.max(v, maxV))
    entityCounter.updateAndGet(v => math.max(v, maxId))
    hash
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
  def latestWins(df: DataFrame): DataFrame =
    latestWinsKeepVersion(df).drop(VersionCol)

  /** Latest-wins resolution that keeps the winning row's version —
    * compaction and tombstoning need `_v` to stay monotonic.
    */
  def latestWinsKeepVersion(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(MergeKeys.map(col): _*).orderBy(col(VersionCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}

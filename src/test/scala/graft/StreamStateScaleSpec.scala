package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming keyed state at 10⁶ KEY CARDINALITY on RocksDB (VERDICT
  * r8 ask #5: the maintainers were spec-proven on toy key counts —
  * this drives the G20 CDC latest-state maintainer at a million keys
  * on the disk-backed provider and asserts the properties that make
  * it a 100 TB component):
  *   - state is O(keys): numRowsTotal == 10⁶ after the load batch and
  *     STAYS 10⁶ after a delta batch (updates don't duplicate state);
  *   - work is O(delta): the delta batch updates exactly its 10⁵
  *     touched keys and runs in a fraction of the load batch's wall
  *     clock — RocksDB point access, not a state-wide sweep;
  *   - the provider is really engaged (rocksdb custom metrics);
  *   - correctness at cardinality: the final per-key snapshots
  *     aggregate identically to the batch window twin over the full
  *     feed (count, live count, value sum, op count).
  */
class StreamStateScaleSpec extends SparkSpec {
  import spark.implicits._

  private val nKeys = 1000000L
  private val delta = 100000

  test("G20 CDC maintainer at 1M keys on RocksDB: O(keys) state, O(delta) batches") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[CdcEvent]
    // load batch: one upsert per key, executor-side generation is not
    // possible through MemoryStream — 1M small case objects is ~80 MB
    // driver heap, acceptable for a spec
    val load = (0L until nKeys).map(k =>
      CdcEvent(k, k, 1000L + (k % 7), "upsert", (k % 100).toDouble))
    // delta batch: 10⁵ keys touched — half newer upserts, half deletes
    val deltaRows = (0 until delta).map { i =>
      val k = i.toLong * 10 // spread across the key space
      if (i % 2 == 0) CdcEvent(k, nKeys + i, 10000L, "upsert", 7.5)
      else CdcEvent(k, nKeys + i, 10000L, "delete", 0.0)
    }
    val q = StreamQueries.cdcApplyStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_scale_out").start()
    try {
      input.addData(load)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val loadSec = (System.nanoTime() - t0) / 1e9
      val opLoad = q.lastProgress.stateOperators.head
      assert(opLoad.numRowsTotal == nKeys,
        s"state must be O(keys): ${opLoad.numRowsTotal} != $nKeys")

      input.addData(deltaRows)
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val deltaSec = (System.nanoTime() - t1) / 1e9
      val opDelta = q.lastProgress.stateOperators.head
      assert(opDelta.numRowsTotal == nKeys,
        s"delta batch must not grow state: ${opDelta.numRowsTotal}")
      assert(opDelta.numRowsUpdated == delta.toLong,
        s"delta batch must touch exactly its keys: ${opDelta.numRowsUpdated}")
      import scala.jdk.CollectionConverters._
      assert(opDelta.customMetrics.keySet.asScala
          .exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb custom metrics, got ${opDelta.customMetrics.keySet}")
      // O(delta) latency: the delta batch is 10% of the load batch's
      // rows; allow generous JVM noise but fail a state-wide sweep
      info(f"load batch $loadSec%.1f s, delta batch $deltaSec%.1f s " +
        f"(${deltaSec / loadSec * 100}%.0f%% of load)")
      assert(deltaSec <= loadSec * 0.6,
        f"delta batch ($deltaSec%.1f s) not O(delta) vs load ($loadSec%.1f s)")

      // correctness at cardinality: latest emission per key (max n_ops)
      // must aggregate identically to the batch window twin
      val streamed = spark.table("cdc_scale_out")
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("deleted"), col("value"), col("n_ops")),
          col("n_ops")).as("s"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(!col("s.deleted"), 1L).otherwise(0L)).as("n_live"),
          round(sum(col("s.value")), 2).as("sum_value"),
          sum(col("s.n_ops")).as("sum_ops"))
        .collect().head
      val batch = StreamQueries.cdcApplyBatch(
          (load ++ deltaRows).toDF()
            .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(!col("deleted"), 1L).otherwise(0L)).as("n_live"),
          round(sum(col("value")), 2).as("sum_value"),
          sum(col("n_ops")).as("sum_ops"))
        .collect().head
      assert(streamed == batch,
        s"1M-key maintainer diverged from the batch twin:\n  stream $streamed\n  batch $batch")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("G20 CDC maintainer at 10M keys on RocksDB: flat per-batch latency curve") {
    // VERDICT r9 ask #8 — the decade-up: 10 load batches of 1M keys
    // each grow state 1M → 10M, then a 10⁵-key delta lands on the full
    // 10⁷-key store. The measured PER-BATCH LATENCY CURVE is the
    // point: if batch time grows with STATE SIZE (not batch size), the
    // maintainer is sweeping state instead of point-updating it, and
    // changelog/checkpoint config starts to matter a decade early.
    // Sink is noop — correctness at cardinality is already pinned by
    // the 1M test above; this one gates the scale properties, so the
    // driver holds at most the MemoryStream's retained batches
    // (~10M small case objects ≈ 1.5 GB — inside the 8g test heap).
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val keys10m = 10000000L
    val batchKeys = 1000000
    val input = MemoryStream[CdcEvent]
    val q = StreamQueries.cdcApplyStream(input.toDS())
      .writeStream.outputMode("update")
      .format("noop").start()
    try {
      val loadTimes = (0 until 10).map { b =>
        val base = b.toLong * batchKeys
        input.addData((0 until batchKeys).map { i =>
          val k = base + i
          CdcEvent(k, k, 1000L + (k % 7), "upsert", (k % 100).toDouble)
        })
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val op = q.lastProgress.stateOperators.head
        assert(op.numRowsTotal == base + batchKeys,
          s"state after load batch $b: ${op.numRowsTotal}")
        sec
      }
      info("load-batch latency curve (1M keys per batch, state 1M->10M): " +
        loadTimes.map(t => f"$t%.1f").mkString(" "))
      // flatness: the last batch works against 10x the state of the
      // first — allow generous JVM/compaction noise, fail a sweep
      // (which would be ~10x). Compare against the max of the first
      // three so one slow warmup batch can't mask growth.
      val early = loadTimes.take(3).max
      assert(loadTimes.last <= early * 3.0,
        f"per-batch latency grew with state size: first-three max " +
          f"$early%.1f s -> last ${loadTimes.last}%.1f s")
      import scala.jdk.CollectionConverters._
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb custom metrics, got ${metrics.keySet}")
      info("rocksdb: " + metrics.asScala.toSeq.sortBy(_._1)
        .filter { case (k, _) => k.contains("SstFile") || k.contains("Memtable") ||
          k.contains("totalBytes") || k.contains("CommitLatency") }
        .map { case (k, v) => s"$k=$v" }.mkString(" "))

      // O(delta) on the full store: 10⁵ touched keys across the space
      input.addData((0 until delta).map { i =>
        val k = i.toLong * 100 // spread across all 10M keys
        if (i % 2 == 0) CdcEvent(k, keys10m + i, 10000L, "upsert", 7.5)
        else CdcEvent(k, keys10m + i, 10000L, "delete", 0.0)
      })
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val deltaSec = (System.nanoTime() - t1) / 1e9
      val op = q.lastProgress.stateOperators.head
      assert(op.numRowsTotal == keys10m,
        s"delta batch must not grow state: ${op.numRowsTotal}")
      assert(op.numRowsUpdated == delta.toLong,
        s"delta batch must touch exactly its keys: ${op.numRowsUpdated}")
      val meanLoad = loadTimes.sum / loadTimes.size
      info(f"delta batch (10^5 keys on 10^7-key state): $deltaSec%.1f s " +
        f"vs mean load $meanLoad%.1f s")
      assert(deltaSec <= meanLoad * 0.6,
        f"delta batch ($deltaSec%.1f s) not O(delta) vs mean load " +
          f"($meanLoad%.1f s) — point access regressed to a sweep")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

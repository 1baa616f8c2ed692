package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Top-level so Spark can derive an Encoder (inner classes can't). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Real Structured Streaming runs (MemoryStream → memory sink),
  * asserting stream output equals the batch-equivalent query on the
  * same rows.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def sampleEvents(n: Int): Seq[Ev] =
    Tables.load(spark, sfDir, "events")
      .orderBy("event_id").limit(n)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .as[Ev].collect().toSeq

  test("stream_window_agg: streaming result == batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = sampleEvents(300)
    input.addData(events)

    val q = StreamQueries.windowAggStream(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_agg_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_agg_out")
        .orderBy("bucket", "event_type").collect().toSeq
      val expected = events.toDF()
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").cast("timestamp_ntz").as("bucket"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("bucket", "event_type").collect().toSeq
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream_sliding_window: streaming result == batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = sampleEvents(300)
    input.addData(events)

    val q = StreamQueries.slidingWindowStream(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_agg_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("slide_agg_out")
        .orderBy("bucket", "event_type").collect().toSeq
      val expected = events.toDF()
        .groupBy(window(col("ts"), "6 hours", "2 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").cast("timestamp_ntz").as("bucket"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("bucket", "event_type").collect().toSeq
      assert(streamed == expected)
      // every event lands in exactly 3 overlapping windows
      assert(streamed.map(_.getLong(2)).sum == 3L * events.size)
    } finally q.stop()
  }

  test("stream_session_window: native session windows merge across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = sampleEvents(300)
    val (first, second) = events.splitAt(150)
    val q = StreamQueries.sessionWindowStream(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_win_out").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("sess_win_out")
        .orderBy("user_id", "sess_start").collect().toSeq
      // batch twin over the union: same native operator
      val expected = StreamQueries.sessionWindowStream(events.toDF()
        .withColumn("ts", col("ts").cast("timestamp")))
        .orderBy("user_id", "sess_start").collect().toSeq
      assert(streamed == expected)
      assert(streamed.nonEmpty)
      // sessions really aggregate: more events than sessions
      assert(streamed.map(_.getAs[Long]("n_events")).sum == events.size)
    } finally q.stop()
  }

  test("stream_session: stateful sessionizer matches batch across two micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val all = sampleEvents(400)
      .map(e => SessEvent(e.user_id, e.event_id, e.ts.getTime * 1000))
      .sortBy(e => (e.ts_us, e.event_id))
    // split by time so per-user order holds across the batch boundary
    val (first, second) = all.splitAt(all.length / 2)
    input.addData(first)

    val q = StreamQueries.sessionizeStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .orderBy("user_id", "event_id").collect().toSeq
      val expected = {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        all.toDF()
          .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(wOrd))
          .withColumn("is_new", when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
          .select(col("user_id"), col("event_id"),
            sum(col("is_new")).over(wCum).cast("long").as("session_id"))
          .orderBy("user_id", "event_id").collect().toSeq
      }
      assert(streamed.nonEmpty)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("stream_join: stream-stream interval join matches batch join") {
    implicit val sqlCtx = spark.sqlContext
    val clickIn = MemoryStream[Ev]
    val purchaseIn = MemoryStream[Ev]
    val all = sampleEvents(400)
    val clicks = all.filter(_.event_type == "click")
    val purchases = all.filter(_.event_type == "purchase")
    clickIn.addData(clicks)
    purchaseIn.addData(purchases)

    val q = StreamQueries.clickPurchaseJoinStream(
      clickIn.toDF().withColumn("ts", col("ts").cast("timestamp")),
      purchaseIn.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("append")
      .format("memory").queryName("join_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("join_out")
        .orderBy("click_id", "purchase_id").collect().toSeq
      val expected = clicks.toDF().as("c").join(purchases.toDF().as("p"),
        col("c.user_id") === col("p.user_id") &&
          col("p.ts") >= col("c.ts") &&
          col("p.ts") <= col("c.ts") + expr("INTERVAL 12 HOURS"))
        .select(col("c.user_id"), col("c.event_id").as("click_id"),
          col("p.event_id").as("purchase_id"))
        .orderBy("click_id", "purchase_id").collect().toSeq
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream_join_outer: unmatched clicks emit nulls after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clickIn = MemoryStream[Ev]
    val purchaseIn = MemoryStream[Ev]
    val all = sampleEvents(400)
    val clicks = all.filter(_.event_type == "click")
    val purchases = all.filter(_.event_type == "purchase")
    val maxTs = all.map(_.ts.getTime).max

    val q = StreamQueries.clickPurchaseOuterStream(
      clickIn.toDF().withColumn("ts", col("ts").cast("timestamp")),
      purchaseIn.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("append")
      .format("memory").queryName("join_outer_out").start()
    try {
      clickIn.addData(clicks)
      purchaseIn.addData(purchases)
      q.processAllAvailable()
      // outer (null) results can only emit once the watermark clears
      // click_ts + 12h: push both watermarks far past every event
      val flush = Ev(999999L, new java.sql.Timestamp(maxTs + 3L * 24 * 3600 * 1000),
        -1L, "flush", 0.0, "{}")
      clickIn.addData(Seq(flush))
      purchaseIn.addData(Seq(flush.copy(event_id = 999998L)))
      q.processAllAvailable()

      val streamed = spark.table("join_outer_out")
        .filter(col("user_id") =!= -1L) // drop the flush rows
        .orderBy("click_id", "purchase_id").collect().toSeq
      val expected = clicks.toDF().as("c").join(purchases.toDF().as("p"),
        col("c.user_id") === col("p.user_id") &&
          col("p.ts") >= col("c.ts") &&
          col("p.ts") <= col("c.ts") + expr("INTERVAL 12 HOURS"), "left_outer")
        .select(col("c.user_id"), col("c.event_id").as("click_id"),
          col("p.event_id").as("purchase_id"))
        .orderBy("click_id", "purchase_id").collect().toSeq
      assert(streamed == expected)
      // the outer semantics actually exercised: some null purchases
      assert(streamed.exists(_.isNullAt(2)))
    } finally q.stop()
  }

  test("stream_ecs_ingest: world state continues across micro-batches") {
    import graft.ecs.{EcsStreamIngest, World}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val all = sampleEvents(300)
    val (first, second) = all.splitAt(all.length / 2)
    val world = World.make(spark, simulation = "stream_sim", run = "r1",
      optimizeInterval = 0)

    val q = EcsStreamIngest.attach(world, input.toDF(), "ecs_ingest_test")
    try {
      input.addData(first)
      q.processAllAvailable()
      assert(world.currentStep == 1L)
      val afterB1 = EcsStreamIngest.liveState(world).get
        .select(col("user_id"), round(col("total"), 2).as("t"), col("n_events"))
        .orderBy("user_id").collect().toSeq
      val expB1 = first.toDF().groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("t"), count(lit(1)).as("n_events"))
        .orderBy("user_id").collect().toSeq
      assert(afterB1 == expB1 && afterB1.nonEmpty)

      input.addData(second)
      q.processAllAvailable()
      assert(world.currentStep == 2L)
      val afterB2 = EcsStreamIngest.liveState(world).get
        .select(col("user_id"), round(col("total"), 2).as("t"), col("n_events"))
        .orderBy("user_id").collect().toSeq
      val expAll = all.toDF().groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("t"), count(lit(1)).as("n_events"))
        .orderBy("user_id").collect().toSeq
      assert(afterB2 == expAll)
      // history holds one frame per step for an entity seen in both halves
      val both = first.map(_.user_id).toSet.intersect(second.map(_.user_id).toSet)
      assert(both.nonEmpty)
      val hist = world.getHistory(Seq(EcsStreamIngest.meta)).values.head
        .filter(col("entity_id") === both.head)
        .select(col("step")).as[Long].collect().sorted.toSeq
      assert(hist == Seq(1L, 2L))
      // O(delta) contract: each step's appended frame is exactly the
      // batch's distinct-user set, NOT a full state snapshot
      val frames = world.getHistory(Seq(EcsStreamIngest.meta)).values.head
        .groupBy(col("step")).agg(count(lit(1)).as("n"))
        .orderBy("step").as[(Long, Long)].collect().toSeq
      assert(frames == Seq(
        1L -> first.map(_.user_id).distinct.size.toLong,
        2L -> second.map(_.user_id).distinct.size.toLong))
    } finally q.stop()
  }

  test("stream_ecs_ingest: batch touching a user subset appends only that subset") {
    import graft.ecs.{EcsStreamIngest, World}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val all = sampleEvents(200)
    val users = all.map(_.user_id).distinct.sorted
    assert(users.size >= 4)
    // batch 2 = events of a strict subset (first half) of batch-1 users
    val subset = users.take(users.size / 2).toSet
    val second = all.filter(e => subset.contains(e.user_id)).take(40)
    val world = World.make(spark, simulation = "stream_sub", run = "r1",
      optimizeInterval = 0)
    val q = EcsStreamIngest.attach(world, input.toDF(), "ecs_ingest_subset")
    try {
      input.addData(all)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      // step-2 frame rows == batch-2 distinct users (strict subset)
      val stepCounts = world.getHistory(Seq(EcsStreamIngest.meta)).values.head
        .groupBy(col("step")).agg(count(lit(1)).as("n"))
        .orderBy("step").as[(Long, Long)].collect().toMap
      assert(stepCounts(2L) == second.map(_.user_id).distinct.size.toLong)
      assert(stepCounts(2L) < stepCounts(1L))
      // untouched users still resolve from their step-1 frame; touched
      // users fold both batches — live == full aggregate over all rows
      val live = EcsStreamIngest.liveState(world).get
        .select(col("user_id"), round(col("total"), 2).as("t"), col("n_events"))
        .orderBy("user_id").collect().toSeq
      val expected = (all ++ second).toDF().groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("t"), count(lit(1)).as("n_events"))
        .orderBy("user_id").collect().toSeq
      assert(live == expected)
      // O(delta) READ contract: the ingest carries running totals in
      // the keyed state store, so batch 2 updates exactly its own
      // distinct-user set even though total state is larger — the
      // per-batch state work must not scale with total entities
      val progresses = q.recentProgress.filter(_.numInputRows > 0)
      assert(progresses.length == 2, "expected two data-carrying batches")
      val b2 = progresses.last.stateOperators.head
      assert(b2.numRowsUpdated == subset.size.toLong,
        s"batch-2 state updates (${b2.numRowsUpdated}) must equal its " +
          s"touched-key count (${subset.size}), not total state " +
          s"(${b2.numRowsTotal})")
      assert(b2.numRowsTotal == users.size.toLong,
        "state store holds every entity ever seen")
      assert(b2.numRowsUpdated < b2.numRowsTotal,
        "read/update work must be a strict subset of total state")
    } finally q.stop()
  }

  test("stream_ecs_ingest: liveSnapshot reads O(live entities) off the state store") {
    import graft.ecs.{EcsStreamIngest, World}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val all = sampleEvents(240)
    val (first, second) = all.splitAt(all.length / 2)
    val world = World.make(spark, simulation = "stream_snap", run = "r1",
      optimizeInterval = 0)
    val ckpt = TmpDir.scratch("snapckpt")
    val q = EcsStreamIngest.attach(world, input.toDF(), "ecs_ingest_snap",
      checkpointLocation = Some(ckpt))
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      // the snapshot equals the history-resolved live view value-for-value
      val snap = EcsStreamIngest.liveSnapshot(spark, ckpt)
      val got = snap
        .select(col("user_id"), round(col("total"), 2).as("t"), col("n_events"))
        .orderBy("user_id").collect().toSeq
      val viaHistory = EcsStreamIngest.liveState(world).get
        .select(col("user_id"), round(col("total"), 2).as("t"), col("n_events"))
        .orderBy("user_id").collect().toSeq
      assert(got == viaHistory && got.nonEmpty)

      // O(live entities) READ contract, asserted on the plan: the read
      // is a flat scan of the keyed state store — no window/row_number
      // over history, no parquet scan of the world's sparse frames, no
      // shuffle. One output row per live entity.
      val plan = snap.queryExecution.executedPlan.toString
      assert(plan.contains("StateScan"),
        s"live snapshot must scan the state store, got:\n$plan")
      assert(!plan.contains("Window"), "snapshot read must not re-window history")
      assert(!plan.contains("Parquet"), "snapshot read must not scan history files")
      assert(snap.count() == all.map(_.user_id).distinct.size.toLong)
    } finally q.stop()
  }

  test("stream_sketch: HLL registers maintained across micro-batches equal batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SketchRow]
    // overlapping item sets across the two batches — the cross-batch
    // merge must dedup items already folded into the state
    val batch1 = (0 until 400).map(i => SketchRow(i % 4, i.toLong))
    val batch2 = (200 until 600).map(i => SketchRow(i % 4, i.toLong))
    val q = StreamQueries.hllMaintainStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sketch_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      // final estimate per shard: registers only grow, so estimates are
      // non-decreasing across emissions and max == the last one
      val streamed = spark.table("sketch_out")
        .groupBy(col("shard")).agg(max(col("approx_items")).as("approx_items"))
        .as[(Long, Long)].collect().toMap
      // batch twin: the graft_hll aggregate over the union
      val batch = (batch1 ++ batch2).toDS()
        .groupBy(col("shard"))
        .agg(graft.functions.SketchAggregates.hll(col("item"), 12).as("e"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        "incrementally-maintained sketch must equal the batch aggregate")
      // and the estimates are actually good: 150 distinct per shard
      streamed.values.foreach(e => assert(math.abs(e - 150L) <= 8L))
      // BOUNDED STATE: the store holds one row per shard (the sketch),
      // not one per item — the property that makes this viable for
      // billions of events per key
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 4L, s"state rows $stateRows != 4 shards")
    } finally q.stop()
  }

  test("RocksDB state store: maintainer output identical, state bounded per key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // same shape as stream_sketch, but the keyed state lives in the
    // disk-backed RocksDB provider Graft.session(rocksDbStateStore=true)
    // surfaces — the 100 TB configuration, where per-key point access
    // must not require the whole state map in executor heap
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[SketchRow]
    val batch1 = (0 until 400).map(i => SketchRow(i % 4, i.toLong))
    val batch2 = (200 until 600).map(i => SketchRow(i % 4, i.toLong))
    val q = StreamQueries.hllMaintainStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sketch_rocks_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("sketch_rocks_out")
        .groupBy(col("shard")).agg(max(col("approx_items")).as("approx_items"))
        .as[(Long, Long)].collect().toMap
      val batch = (batch1 ++ batch2).toDS()
        .groupBy(col("shard"))
        .agg(graft.functions.SketchAggregates.hll(col("item"), 12).as("e"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        "RocksDB-backed maintainer must equal the batch aggregate")
      val op = q.lastProgress.stateOperators.head
      assert(op.numRowsTotal == 4L, s"state rows ${op.numRowsTotal} != 4 shards")
      // provider really engaged: RocksDB reports its own custom metrics
      assert(op.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb custom metrics, got ${op.customMetrics.keySet}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RocksDB state store: G3 sessionizer identical on the disk-backed provider") {
    implicit val sqlCtx = spark.sqlContext
    import scala.jdk.CollectionConverters._
    // the flatMapGroupsWithState sessionizer (G3) on the provider its
    // docstring recommends for 100 TB key cardinality — per-user session
    // state lives in RocksDB, output must be bit-identical to the
    // default-provider run (= the batch window twin below)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[SessEvent]
    val all = sampleEvents(400)
      .map(e => SessEvent(e.user_id, e.event_id, e.ts.getTime * 1000))
      .sortBy(e => (e.ts_us, e.event_id))
    val (first, second) = all.splitAt(all.length / 2)
    input.addData(first)
    val q = StreamQueries.sessionizeStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_rocks_out").start()
    try {
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("sess_rocks_out")
        .orderBy("user_id", "event_id").collect().toSeq
      val expected = {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        all.toDF()
          .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(wOrd))
          .withColumn("is_new", when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
          .select(col("user_id"), col("event_id"),
            sum(col("is_new")).over(wCum).cast("long").as("session_id"))
          .orderBy("user_id", "event_id").collect().toSeq
      }
      assert(streamed.nonEmpty)
      assert(streamed == expected,
        "RocksDB-backed sessionizer must equal the batch window twin")
      val op = q.lastProgress.stateOperators.head
      assert(op.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb custom metrics, got ${op.customMetrics.keySet}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream_cms: counters maintained across micro-batches equal batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SketchRow]
    // items over a 64-value domain, probe = 7; batches overlap so the
    // cross-batch counter ADDITION (not max) is what's exercised
    val batch1 = (0 until 500).map(i => SketchRow(i % 4, (i % 64).toLong))
    val batch2 = (300 until 900).map(i => SketchRow(i % 4, (i % 64).toLong))
    val q = StreamQueries.cmsMaintainStream(input.toDS(), probe = 7L)
      .writeStream.outputMode("update")
      .format("memory").queryName("cms_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      // counters only grow → final estimate = max emission per shard
      val streamed = spark.table("cms_out")
        .groupBy(col("shard")).agg(max(col("probe_est")).as("e"))
        .as[(Long, Long)].collect().toMap
      val batch = (batch1 ++ batch2).toDS()
        .groupBy(col("shard"))
        .agg(graft.functions.SketchAggregates.cmsEstimate(
          col("item"), lit(7L)).as("e"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        "incrementally-maintained CMS must equal the batch aggregate")
      // CMS never undercounts the true probe frequency
      val exact = (batch1 ++ batch2).groupBy(_.shard)
        .map { case (s, rows) => s -> rows.count(_.item == 7L).toLong }
      exact.foreach { case (s, n) => assert(streamed(s) >= n) }
      // bounded state: one counter-array row per shard, not per item
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 4L, s"state rows $stateRows != 4 shards")
    } finally q.stop()
  }

  test("stream_topk: MG counters maintained across micro-batches hold the bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TokRow]
    val cap = 4
    // planted heavy key spread over both batches + singleton noise
    val batch1 = Seq.fill(120)(TokRow(0, "heavy")) ++
      (0 until 60).map(i => TokRow(0, s"rare$i"))
    val batch2 = Seq.fill(80)(TokRow(0, "heavy")) ++
      (60 until 120).map(i => TokRow(0, s"rare$i"))
    val q = StreamQueries.topkMaintainStream(input.toDS(), cap)
      .writeStream.outputMode("update")
      .format("memory").queryName("topk_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val all = batch1 ++ batch2
      val n = all.size.toLong
      val exact = all.groupBy(_.tok).map { case (k, v) => k -> v.size.toLong }
      // last emission = summary over the concatenated stream
      val m = spark.table("topk_out").as[TopkState].collect()
        .filter(_.shard == 0L).last.summary
      assert(m.size <= cap)
      assert(m.contains("heavy"), "heavy key (freq > n/(k+1)) must survive")
      (exact.keySet ++ m.keySet).foreach { k =>
        val e = exact.getOrElse(k, 0L)
        val est = m.getOrElse(k, 0L)
        assert(est <= e && est >= e - n / (cap + 1) - 1,
          s"bound violated for $k: est=$est exact=$e")
      }
    } finally q.stop()
  }

  test("stream_exactly_once: replayed micro-batch replaces, never duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = sampleEvents(300)
    val (first, second) = events.splitAt(150)
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_eos_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamQueries.exactlyOnceSink(input.toDF(), tmp)
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    // at-least-once replay: the sink re-runs batch 1 with the same
    // rows (what a crash between write and checkpoint commit causes)
    second.toDF().write.mode("overwrite").parquet(s"$tmp/batch=1")
    val back = spark.read.parquet(tmp).drop("batch")
    assert(back.count() == events.size.toLong, "replay must not duplicate")
    val gotIds = back.select("event_id").as[Long].collect().sorted.toSeq
    assert(gotIds == events.map(_.event_id).sorted)
  }

  test("stream_static_join: enrichment against static dimension == batch join") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = sampleEvents(300)
    val customer = Tables.load(spark, sfDir, "customer")
    val q = StreamQueries.staticJoinStream(input.toDF(), customer)
      .writeStream.outputMode("append")
      .format("memory").queryName("static_join_out").start()
    try {
      input.addData(events.take(150))
      q.processAllAvailable()
      input.addData(events.drop(150))
      q.processAllAvailable()
      val streamed = spark.table("static_join_out")
        .orderBy("event_id").collect().toSeq
      val expected = StreamQueries.staticJoinStream(events.toDF(), customer)
        .orderBy("event_id").collect().toSeq
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream_quantile: KLL maintained across micro-batches holds the rank bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[QuantRow]
    val batch1 = (1 to 5000).map(i => QuantRow(i % 2, i.toDouble))
    val batch2 = (5001 to 10000).map(i => QuantRow(i % 2, i.toDouble))
    val q = StreamQueries.kllMaintainStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("quant_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      // emission with the highest n_seen = estimate over ALL values
      val est = spark.table("quant_out")
        .orderBy(col("n_seen").desc).dropDuplicates("shard")
        .select(col("shard"), col("approx_p50"))
        .as[(Long, Double)].collect().toMap
      val all = batch1 ++ batch2
      est.foreach { case (shard, p50) =>
        val xs = all.filter(_.shard == shard).map(_.value)
        val rank = xs.count(_ <= p50).toDouble / xs.size
        assert(math.abs(rank - 0.5) <= 0.03,
          s"shard $shard stream median rank $rank")
      }
      assert(est.size == 2)
    } finally q.stop()
  }

  test("stream_dedup_watermark: state evicts past the watermark, dup re-emits") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val input = MemoryStream[Ev]
    // base well above epoch: the initial watermark is 1970-01-01, and
    // rows at-or-below the watermark are dropped as late on arrival
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ev(id: Long, user: Long, tsMin: Long) = Ev(id,
      new Timestamp(base + tsMin * 60000L), user, "click", 1.0, """{}""")
    val q = StreamQueries.dedupWithinWatermarkStream(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")),
      delay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      // batch 1: key (1, click) at t=0 kept; dup at t=5 (within the
      // 10-min delay) suppressed; a second key seeds the watermark later
      input.addData(ev(1, 1L, 0), ev(2, 1L, 5), ev(3, 2L, 0))
      q.processAllAvailable()
      val afterB1 = spark.table("dedup_wm_out")
        .select(col("event_id")).as[Long].collect().sorted.toSeq
      assert(afterB1 == Seq(1L, 3L), s"dup within delay must be dropped: $afterB1")
      val b1State = q.lastProgress.stateOperators.head.numRowsTotal
      assert(b1State == 2L, s"state holds both keys, got $b1State")
      // batch 2: advance event time far past t=0+delay — watermark
      // moves, key-1 state evicts, and a NEW key-1 event re-emits
      input.addData(ev(4, 2L, 60))
      q.processAllAvailable() // watermark -> 50 min; key-1/key-2 old state dies
      input.addData(ev(5, 1L, 55))
      q.processAllAvailable()
      val afterB3 = spark.table("dedup_wm_out")
        .select(col("event_id")).as[Long].collect().sorted.toSeq
      assert(afterB3.contains(5L),
        s"key re-emits after its state evicted past the watermark: $afterB3")
      // bounded state: evicted keys really left the store
      val finalState = q.lastProgress.stateOperators.head.numRowsTotal
      assert(finalState < b1State + 2,
        s"state must shrink by eviction, got $finalState rows")
    } finally q.stop()
  }

  test("stream_file_ingest: AvailableNow drains drops, terminates, resumes incrementally") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_fs_${java.util.UUID.randomUUID().toString.take(8)}"
    val ck = s"$tmp/_checkpoint"
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id").limit(400)
    def runOnce(name: String): Unit = {
      val q = spark.readStream.schema(StreamQueries.FileIngestSchema)
        .json(s"$tmp/data")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ck)
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      // AvailableNow processes everything present, then STOPS on its own
      assert(q.awaitTermination(120000), "AvailableNow query must terminate")
    }
    def expected(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("event_type").collect().toSeq
    // drop 1 → first incremental run sees only it
    ev.filter(col("event_id") % 2 === 0).write.mode("overwrite").json(s"$tmp/data")
    runOnce("fs_out1")
    assert(spark.table("fs_out1").orderBy("event_type").collect().toSeq ==
      expected(ev.filter(col("event_id") % 2 === 0)))
    // drop 2 lands; resuming from the checkpoint ingests ONLY new files
    // but the complete-mode aggregate now covers both drops
    ev.filter(col("event_id") % 2 === 1).write.mode("append").json(s"$tmp/data")
    runOnce("fs_out2")
    assert(spark.table("fs_out2").orderBy("event_type").collect().toSeq ==
      expected(ev))
  }

  test("HLL maintainer on transformWithState == mapGroupsWithState == batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[SketchRow]
    val batch1 = (0 until 400).map(i => SketchRow(i % 4, i.toLong))
    val batch2 = (200 until 600).map(i => SketchRow(i % 4, i.toLong))
    val q = StreamQueries.hllMaintainTws(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("hll_tws_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("hll_tws_out")
        .groupBy(col("shard")).agg(max(col("approx_items")).as("approx_items"))
        .as[(Long, Long)].collect().toMap
      // byte-identical register algebra ⇒ equal to the batch aggregate
      val batch = (batch1 ++ batch2).toDS()
        .groupBy(col("shard"))
        .agg(graft.functions.SketchAggregates.hll(col("item"), 12).as("e"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        "transformWithState HLL must equal the batch aggregate")
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 4L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("text-gate maintainer on transformWithState == batch column gates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val batch1 = Seq(
      GateDoc("web", 1L, "the quick brown fox jumps over the lazy dog"),
      GateDoc("web", 2L, "spam spam spam spam spam"),
      GateDoc("code", 3L, ""), // degenerate: zero tokens
      GateDoc("code", 4L, "x")) // single token: top-unigram mass = 1.0
    val batch2 = Seq(
      GateDoc("web", 5L, "a b a b a b a b"), // bigram-dominated
      GateDoc("code", 6L, "def f of x returns x plus one with unique words"))
    val input = MemoryStream[GateDoc]
    val q = StreamQueries.textGateMaintain(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("gate_tws_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      // counters are monotone, so max across update rows = final state
      val streamed = spark.table("gate_tws_out")
        .groupBy(col("source"))
        .agg(max(col("n_docs")).as("n_docs"), max(col("n_kept")).as("n_kept"),
          max(col("kept_tokens")).as("kept_tokens"))
        .as[GateSummary].collect().map(g => g.source -> g).toMap
      val batch = StreamQueries.textGateBatch((batch1 ++ batch2).toDF())
        .as[GateSummary].collect().map(g => g.source -> g).toMap
      assert(streamed == batch,
        "streaming gate counters must equal the batch column gates")
      // state is one row per source regardless of doc volume
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("next-fit packer on transformWithState == batch fold, bins continue across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    // limit 10: doc 3 (n=7) overflows the open bin (fill 4+5=9? no —
    // 4, then 5 overflows? 4+5=9 <= 10 stays; +7 overflows → bin 1)
    val batch1 = Seq(PackDoc("web", 1L, 4L), PackDoc("web", 2L, 5L),
      PackDoc("code", 10L, 12L)) // oversized doc: own bin
    val batch2 = Seq(PackDoc("web", 3L, 7L), PackDoc("web", 4L, 3L),
      PackDoc("code", 11L, 1L))
    val input = MemoryStream[PackDoc]
    val q = StreamQueries.packStream(input.toDS(), limit = 10L)
      .writeStream.outputMode("update")
      .format("memory").queryName("pack_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("pack_out")
        .as[PackAssign].collect().map(a => (a.source, a.doc_id) -> a.bin_id).toMap
      // batch fold over the SAME docs (text synthesized to the token
      // count: n tokens = n-1 spaces + 1)
      val docs = (batch1 ++ batch2)
        .map(d => (d.source, d.doc_id, Seq.fill(d.n_tokens.toInt)("w").mkString(" ")))
        .toDF("source", "doc_id", "text")
      val batch = StreamQueries.packBatch(docs, limit = 10L)
        .as[PackAssign].collect().map(a => (a.source, a.doc_id) -> a.bin_id).toMap
      assert(streamed == batch,
        "streaming next-fit assignments must equal the batch fold")
      // the open-bin state carried across batches: web doc 3 landed in
      // bin 1 (not a fresh bin 0), and state is one row per source
      assert(streamed(("web", 3L)) == 1L)
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("CDC apply on transformWithState == batch latest-wins, deletes tombstone") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    // user 1: upsert then delete (tombstone survives as deleted=true);
    // user 2: upserts across batches, batch-2 event is LATE (older ts)
    // so it must bump n_ops without overriding the value;
    // user 3: appears only in batch 2.
    val batch1 = Seq(
      CdcEvent(1L, 10L, 1000L, "upsert", 5.0),
      CdcEvent(2L, 11L, 1500L, "upsert", 7.0),
      CdcEvent(2L, 12L, 2000L, "upsert", 9.0))
    val batch2 = Seq(
      CdcEvent(1L, 13L, 3000L, "delete", 0.0),
      CdcEvent(2L, 14L, 1800L, "upsert", 99.0), // late: older than event 12
      CdcEvent(3L, 15L, 2500L, "upsert", 4.0))
    val input = MemoryStream[CdcEvent]
    val q = StreamQueries.cdcApplyStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_out").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      // latest emission per key = the maintained snapshot
      val streamed = spark.table("cdc_out").as[CdcSnap].collect()
        .groupBy(_.user_id).map { case (k, snaps) =>
          k -> snaps.maxBy(_.n_ops)
        }
      val batch = StreamQueries.cdcApplyBatch(
        (batch1 ++ batch2).toDF()
          .withColumn(
            "ts", org.apache.spark.sql.functions.timestamp_micros($"ts_us"))
          .drop("ts_us"))
        .collect().map { r =>
          r.getAs[Long]("user_id") ->
            ((r.getAs[Long]("last_event_id"), r.getAs[Boolean]("deleted"),
              r.getAs[Double]("value"), r.getAs[Long]("n_ops")))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, s0) =>
        assert((s0.last_event_id, s0.deleted, s0.value, s0.n_ops) == batch(k),
          s"user $k: streaming snapshot must equal the batch latest-wins row")
      }
      // the late event bumped n_ops but did not override the value
      assert(streamed(2L).value == 9.0 && streamed(2L).n_ops == 3L)
      assert(streamed(1L).deleted, "delete must tombstone user 1")
      // state is one row per key ever seen
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 3L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("KLL maintainer on transformWithState == mapGroupsWithState fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val rnd = new scala.util.Random(43)
    val batch1 = (0 until 600).map(_ => QuantRow(rnd.nextInt(4).toLong, rnd.nextDouble() * 100))
    val batch2 = (0 until 600).map(_ => QuantRow(rnd.nextInt(4).toLong, rnd.nextDouble() * 100))
    val inTws = MemoryStream[QuantRow]
    val inMgs = MemoryStream[QuantRow]
    val qTws = StreamQueries.kllMaintainTws(inTws.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("kll_tws_out").start()
    val qMgs = StreamQueries.kllMaintainStream(inMgs.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("kll_mgs_out").start()
    try {
      Seq((inTws, qTws), (inMgs, qMgs)).foreach { case (in, q) =>
        in.addData(batch1); q.processAllAvailable()
        in.addData(batch2); q.processAllAvailable()
      }
      // identical KllOps algebra + identical batch split ⇒ identical
      // compactor state ⇒ identical (n, p50) per shard
      def lastPerShard(table: String) = spark.table(table)
        .groupBy(col("shard")).agg(max(col("n_seen")).as("n"),
          max(struct(col("n_seen"), col("approx_p50"))).as("s"))
        .select(col("shard"), col("n"), round(col("s.approx_p50"), 6).as("p50"))
        .orderBy("shard").collect().toSeq
      val tws = lastPerShard("kll_tws_out")
      assert(tws == lastPerShard("kll_mgs_out") && tws.nonEmpty,
        "tws KLL must fold identically to the mapGroupsWithState maintainer")
    } finally {
      qTws.stop(); qMgs.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("CMS maintainer on transformWithState == batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[SketchRow]
    val batch1 = (0 until 500).map(i => SketchRow(i % 4, i.toLong % 64))
    val batch2 = (0 until 500).map(i => SketchRow(i % 4, (i * 3).toLong % 64))
    val q = StreamQueries.cmsMaintainTws(input.toDS(), probe = 7L)
      .writeStream.outputMode("update")
      .format("memory").queryName("cms_tws_out").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("cms_tws_out")
        .groupBy(col("shard")).agg(max(col("probe_est")).as("probe_est"))
        .as[(Long, Long)].collect().toMap
      // counter addition commutes ⇒ equals the batch aggregate estimate
      val batch = (batch1 ++ batch2).toDS()
        .groupBy(col("shard"))
        .agg(graft.functions.SketchAggregates.cmsEstimate(
          col("item"), lit(7L)).as("e"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch,
        "transformWithState CMS must equal the batch aggregate")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("MG maintainer on transformWithState (MapState) == mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val words = Vector("alpha", "beta", "gamma", "delta", "heavy", "eps",
      "zeta", "eta", "theta", "iota", "kappa", "lam")
    val rnd = new scala.util.Random(7)
    def mk(n: Int) = (0 until n).map { _ =>
      val tok = if (rnd.nextInt(3) == 0) "heavy" else words(rnd.nextInt(words.size))
      TokRow(rnd.nextInt(2).toLong, tok)
    }
    val (batch1, batch2) = (mk(400), mk(400))
    val inTws = MemoryStream[TokRow]
    val inMgs = MemoryStream[TokRow]
    val qTws = StreamQueries.topkMaintainTws(inTws.toDS(), capacity = 4)
      .writeStream.outputMode("update")
      .format("memory").queryName("mg_tws_out").start()
    val qMgs = StreamQueries.topkMaintainStream(inMgs.toDS(), capacity = 4)
      .writeStream.outputMode("update")
      .format("memory").queryName("mg_mgs_out").start()
    try {
      Seq((inTws, qTws), (inMgs, qMgs)).foreach { case (in, q) =>
        in.addData(batch1); q.processAllAvailable()
        in.addData(batch2); q.processAllAvailable()
      }
      // same algebra + same batch split ⇒ identical final summaries,
      // even though tws keeps them entry-wise in MapState
      def lastMap(table: String): Map[Long, Map[String, Long]] = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(monotonically_increasing_id().desc)
        spark.table(table).withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1).select(col("shard"), col("summary"))
          .as[(Long, Map[String, Long])].collect().toMap
      }
      val a = lastMap("mg_tws_out")
      val b = lastMap("mg_mgs_out")
      assert(a == b && a.nonEmpty,
        "tws MG summaries must equal the mapGroupsWithState maintainer")
      // the heavy hitter survives in every shard's summary
      assert(a.values.forall(_.contains("heavy")))
      // disk-backed provider really engaged on BOTH queries (the 100 TB
      // configuration for MapState-entry-wise heavy-hitter state)
      import scala.jdk.CollectionConverters._
      Seq(qTws, qMgs).foreach { q =>
        val op = q.lastProgress.stateOperators.head
        assert(op.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb custom metrics, got ${op.customMetrics.keySet}")
      }
    } finally {
      qTws.stop(); qMgs.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("sketch maintainer TTL: idle keys evict, returning key restarts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[SketchRow]
    // 100 distinct items for shard 0, then (after the TTL passes) 40
    // DIFFERENT items: if the state survived, the estimate would be
    // ~140 — eviction means the second batch restarts near 40.
    // ProcessingTime mode keeps the query constructing batches forever
    // (TTL advances with processing time, so shouldRunAnotherBatch
    // never goes idle) — processAllAvailable/awaitTermination would
    // hang. The test therefore POLLS the sink for each emission and
    // stops the query explicitly; empty batches emit nothing (no input
    // rows for the key ⇒ no handleInputRows call), so exactly two rows
    // ever land.
    val batch1 = (0 until 100).map(i => SketchRow(0L, i.toLong))
    val batch2 = (1000 until 1040).map(i => SketchRow(0L, i.toLong))
    val q = StreamQueries.hllMaintainTws(input.toDS(),
      ttl = Some(java.time.Duration.ofMillis(400)))
      .writeStream.outputMode("update")
      .format("memory").queryName("hll_ttl_out").start()
    def pollRows(atLeast: Int): Seq[Long] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var rows = Seq.empty[Long]
      while (rows.size < atLeast && System.nanoTime() < deadline) {
        rows = spark.table("hll_ttl_out")
          .select(col("approx_items")).as[Long].collect().toSeq
        if (rows.size < atLeast) Thread.sleep(100)
      }
      rows
    }
    try {
      input.addData(batch1)
      val after1 = pollRows(1).head
      assert(math.abs(after1 - 100L) <= 5L)
      Thread.sleep(1500) // let the TTL lapse well past 400ms
      input.addData(batch2)
      val rows = pollRows(2)
      assert(rows.size == 2, s"expected exactly two emissions, got $rows")
      val after2 = rows.filterNot(_ == after1).headOption.getOrElse(rows.last)
      assert(math.abs(after2 - 40L) <= 4L,
        s"expired key must restart from an empty sketch, got $after2 " +
          s"(~140 would mean the state survived the TTL)")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("sketch maintainers: state-source snapshots equal the last emitted estimates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    try {
      // HLL — two batches; registers only grow, so last estimate = max
      val inH = MemoryStream[SketchRow]
      val ckH = TmpDir.scratch("hllsnapckpt")
      val qH = StreamQueries.hllMaintainTws(inH.toDS())
        .writeStream.outputMode("update").option("checkpointLocation", ckH)
        .format("memory").queryName("hll_snap_out").start()
      try {
        inH.addData((0 until 400).map(i => SketchRow(i % 4, i.toLong)))
        qH.processAllAvailable()
        inH.addData((200 until 600).map(i => SketchRow(i % 4, i.toLong)))
        qH.processAllAvailable()
        val last = spark.table("hll_snap_out")
          .groupBy(col("shard")).agg(max(col("approx_items")).as("e"))
          .as[(Long, Long)].collect().toMap
        val snap = StreamQueries.hllSnapshot(spark, ckH)
        val got = snap.collect().map(e => e.shard -> e.approx_items).toMap
        assert(got == last && got.size == 4,
          s"HLL snapshot $got must equal last emissions $last")
        // the poll is a state-store scan, not a history or sink read
        val plan = snap.queryExecution.executedPlan.toString
        assert(plan.contains("StateScan"), s"expected a state scan:\n$plan")
        assert(!plan.contains("Window") && !plan.contains("Parquet"))
      } finally qH.stop()

      // KLL — (n, p50) of the last emission per shard via max-struct
      val inK = MemoryStream[QuantRow]
      val ckK = TmpDir.scratch("kllsnapckpt")
      val rnd = new scala.util.Random(47)
      val qK = StreamQueries.kllMaintainTws(inK.toDS())
        .writeStream.outputMode("update").option("checkpointLocation", ckK)
        .format("memory").queryName("kll_snap_out").start()
      try {
        inK.addData((0 until 600).map(_ => QuantRow(rnd.nextInt(4).toLong, rnd.nextDouble() * 100)))
        qK.processAllAvailable()
        inK.addData((0 until 600).map(_ => QuantRow(rnd.nextInt(4).toLong, rnd.nextDouble() * 100)))
        qK.processAllAvailable()
        val last = spark.table("kll_snap_out")
          .groupBy(col("shard"))
          .agg(max(struct(col("n_seen"), col("approx_p50"))).as("s"))
          .select(col("shard"), col("s.n_seen"), col("s.approx_p50"))
          .as[(Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val got = StreamQueries.kllSnapshot(spark, ckK).collect()
          .map(e => e.shard -> ((e.n_seen, e.approx_p50))).toMap
        assert(got == last && got.size == 4,
          s"KLL snapshot $got must equal last emissions $last")
      } finally qK.stop()

      // CMS — probe estimate of the last emission (counters only grow)
      val inC = MemoryStream[SketchRow]
      val ckC = TmpDir.scratch("cmssnapckpt")
      val qC = StreamQueries.cmsMaintainTws(inC.toDS(), probe = 7L)
        .writeStream.outputMode("update").option("checkpointLocation", ckC)
        .format("memory").queryName("cms_snap_out").start()
      try {
        inC.addData((0 until 500).map(i => SketchRow(i % 4, (i % 40).toLong)))
        qC.processAllAvailable()
        inC.addData((0 until 500).map(i => SketchRow(i % 4, (i % 25).toLong)))
        qC.processAllAvailable()
        val last = spark.table("cms_snap_out")
          .groupBy(col("shard")).agg(max(col("probe_est")).as("e"))
          .as[(Long, Long)].collect().toMap
        val got = StreamQueries.cmsSnapshot(spark, ckC, probe = 7L).collect()
          .map(e => e.shard -> e.probe_est).toMap
        assert(got == last && got.size == 4,
          s"CMS snapshot $got must equal last emissions $last")
      } finally qC.stop()

      // MG — map-state entries regroup into the emitted summary (one
      // batch: cross-batch maintenance is the G12 test's job)
      val inM = MemoryStream[TokRow]
      val ckM = TmpDir.scratch("mgsnapckpt")
      val qM = StreamQueries.topkMaintainTws(inM.toDS(), capacity = 8)
        .writeStream.outputMode("update").option("checkpointLocation", ckM)
        .format("memory").queryName("mg_snap_out").start()
      try {
        inM.addData((0 until 600).map(i => TokRow(i % 2, s"t${i % (10 + (i % 2) * 5)}")))
        qM.processAllAvailable()
        val last = spark.table("mg_snap_out")
          .as[TopkState].collect().map(t => t.shard -> t.summary).toMap
        val got = StreamQueries.topkSnapshot(spark, ckM).collect()
          .map(t => t.shard -> t.summary).toMap
        assert(got == last && got.size == 2,
          s"MG snapshot $got must equal emitted summaries $last")
      } finally qM.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream_funnel: mergeable funnel state across out-of-order micro-batches == batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[FunnelEvent]
    val all = sampleEvents(400).map(e =>
      FunnelEvent(e.user_id, e.event_type, e.ts.getTime * 1000L))
    // split by index PARITY, not time: batch 2 delivers events that
    // precede batch 1's in event time — the mergeability claim under test
    val (first, second) = all.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (a, b) => (a.map(_._1), b.map(_._1))
    }
    val q = StreamQueries.funnelStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n_events").desc)
      val streamed = spark.table("funnel_out")
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("funnel_stage"))
        .orderBy("user_id").collect().toSeq
      val batch = all.toDS()
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts_us"))).as("tv"),
          min(when(col("event_type") === "click", col("ts_us"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts_us"))).as("tp"))
        .select(col("user_id"),
          when(col("tv").isNull, 0L)
            .when(col("tc").isNull || col("tc") < col("tv"), 1L)
            .when(col("tp").isNull || col("tp") < col("tc"), 2L)
            .otherwise(3L).as("funnel_stage"))
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch,
        "incremental funnel state must equal the batch mins derivation")
      assert(streamed.map(_.getLong(1)).toSet.size > 1,
        "corpus should exercise more than one funnel stage")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream_cusum: maintainer across micro-batches == sorted batch fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[CusumEvent]
    val all = sampleEvents(400).sortBy(e => (e.ts.getTime, e.event_id)).map(e =>
      CusumEvent(e.event_type, e.event_id, e.ts.getTime * 1000L,
        BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val (first, second) = all.splitAt(all.length / 2)
    val q = StreamQueries.cusumStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cusum_out").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("n_events").desc)
      val streamed = spark.table("cusum_out")
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("event_type"), col("n_events"), col("n_alarms"),
          col("max_s_cents"), col("final_s_cents"))
        .orderBy("event_type").collect().toSeq
      val batch = StreamQueries.cusumBatch(
        all.toDS().toDF()
          .select(col("event_type"), col("event_id"), col("ts_us"),
            col("v_cents")))
        .collect().toSeq
      assert(streamed == batch,
        "streaming CUSUM state must equal the sorted batch fold")
      assert(streamed.map(_.getLong(2)).sum > 0,
        "corpus should trigger at least one alarm")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream_tws: transformWithState running stats across micro-batches == batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState runs only on the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val input = MemoryStream[StreamQueries.TwsEvent]
    val all = sampleEvents(300).map(e => StreamQueries.TwsEvent(e.user_id, e.value))
    val (first, second) = all.splitAt(all.length / 2)
    val q = StreamQueries.twsRunningStats(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("tws_out").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      // last emission per user is the full running summary
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n").desc)
      val streamed = spark.table("tws_out")
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("n"), round(col("total"), 2).as("total"),
          round(col("vmin"), 2).as("vmin"), round(col("vmax"), 2).as("vmax"))
        .orderBy("user_id").collect().toSeq
      val batch = all.toDS().groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"),
          round(min(col("value")), 2).as("vmin"),
          round(max(col("value")), 2).as("vmax"))
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch,
        "transformWithState running stats must equal the batch aggregate")
      assert(streamed.nonEmpty)
      // per-batch work = touched keys, not total state
      val op = q.lastProgress.stateOperators.head
      assert(op.numRowsUpdated == second.map(_.user_id).distinct.size.toLong)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream_dedup: streaming keeps first arrival per (user, type)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // feed in event-time order so first-arrival == earliest-ts
    val events = sampleEvents(300).sortBy(e => (e.ts.getTime, e.event_id))
    input.addData(events)

    val q = StreamQueries.dedupStream(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .orderBy("user_id", "event_type").collect().toSeq
      val expected = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        events.toDF()
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"),
            col("event_id").as("first_event_id"),
            col("ts").cast("timestamp_ntz").as("first_ts"))
          .orderBy("user_id", "event_type").collect().toSeq
      }
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream_asof_enrich: per-micro-batch native as-of == whole-table batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = sampleEvents(300)
    val orders = Tables.load(spark, sfDir, "orders")
    val tmp = TmpDir.scratch("asof_enrich")
    val q = input.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        StreamQueries.asofEnrichBatch(batch, orders)
          .write.mode("overwrite").parquet(s"$tmp/batch=$batchId")
      }.start()
    try {
      input.addData(events.take(150))
      q.processAllAvailable()
      input.addData(events.drop(150))
      q.processAllAvailable()
      val streamed = spark.read.parquet(tmp).drop("batch")
        .orderBy("event_id").collect().toSeq
      val expected = StreamQueries.asofEnrichBatch(events.toDF(), orders)
        .orderBy("event_id").collect().toSeq
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream_incremental_dedup: registry state survives batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocIn]
    // 120 docs over 30 digest families; contiguous id batches so
    // first-arrival == min doc_id (the batch twin's contract)
    val all = (1 to 120).map(id => DocIn(id.toLong, s"h${id % 30}"))
    val q = StreamQueries.incrementalDedupStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("incdedup_out").start()
    try {
      Seq(all.take(40), all.slice(40, 80), all.drop(80)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("incdedup_out")
        .orderBy("doc_id").as[DocDecision].collect().toSeq
      val expected = all.groupBy(_.h).values.flatMap { fam =>
        val canon = fam.map(_.doc_id).min
        fam.map(d => DocDecision(d.doc_id, d.doc_id == canon, canon))
      }.toSeq.sortBy(_.doc_id)
      assert(streamed == expected)
      // cross-batch rejections exist: docs 31..120 all repeat digests
      assert(streamed.count(!_.admitted) == 90)
    } finally q.stop()
  }

  test("gap detector: closed gaps match batch; event-time timer flags the silent source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val hour = 3600L * 1000000L
    def ev(k: String, id: Long, us: Long) =
      GapEvent(k, id, us, new java.sql.Timestamp(us / 1000))
    // "alive" keeps emitting (with two planted >1h gaps); "dead" stops
    // after t=1h — only the event-time timer can notice that
    // nothing at ts<=0: rows at the initial watermark are dropped as late
    val batch1 = Seq(
      ev("alive", 1, hour), ev("alive", 2, hour * 3 / 2), ev("alive", 3, hour * 2),
      ev("alive", 4, hour * 7 / 2), // closed gap 1.5h
      ev("alive", 5, hour * 4),
      ev("dead", 10, hour), ev("dead", 11, hour * 2))
    val batch2 = Seq( // closed gap 3h; watermark (4h) passes dead's 3h timer
      ev("alive", 6, hour * 7), ev("alive", 7, hour * 36 / 5))
    val batch3 = Seq(ev("alive", 8, hour * 8))
    val all = batch1 ++ batch2 ++ batch3
    val input = MemoryStream[GapEvent]
    val q = StreamQueries.gapDetectStream(
        input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("update")
      .format("memory").queryName("gap_out").start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val rows = spark.table("gap_out").as[GapReport].collect()
      val alerts = rows.filter(_.silent_alert)
      assert(alerts.map(_.event_type).toSet == Set("dead"),
        "only the stalled key's timer may fire")
      assert(alerts.head.n_events == 2L)
      val finals = rows.filter(!_.silent_alert)
        .groupBy(_.event_type).map { case (k, ss) => k -> ss.maxBy(_.n_events) }
      val batch = StreamQueries.gapDetectBatch(
        all.toDF().select(col("event_type"), col("event_id"), col("ts_us")))
        .collect().map { r =>
          r.getAs[String]("event_type") ->
            ((r.getAs[Long]("n_events"), r.getAs[Long]("n_gaps"),
              r.getAs[Double]("max_gap_min"), r.getAs[Boolean]("silent_alert")))
        }.toMap
      finals.foreach { case (k, s0) =>
        val (ne, ng, mx, _) = batch(k)
        assert((s0.n_events, s0.n_gaps, s0.max_gap_min) == ((ne, ng, mx)),
          s"key $k: streaming gap stats must equal the batch lag window")
      }
      // batch end-of-feed silence agrees with the timer verdict
      assert(batch("dead")._4 && !batch("alive")._4)
      assert(finals("alive").n_gaps == 2L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("token-bucket limiter == batch sorted fold, burst then throttle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val hour = 3600L * 1000000L
    // key "fast": 12 events 10 min apart — the 4-token burst admits
    // the head, then 1/hour refill throttles most of the tail;
    // key "slow": 6 events 2 h apart — always admitted
    val evs =
      (0 until 12).map(i => RateEvent("fast", i.toLong, i * hour / 6)) ++
        (0 until 6).map(i => RateEvent("slow", 100L + i, i * 2 * hour))
    val batches = Seq(evs.filter(_.ts_us < 2 * hour), evs.filter(_.ts_us >= 2 * hour))
    val input = MemoryStream[RateEvent]
    val q = StreamQueries.rateLimitStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("rate_out").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("rate_out").as[RateSummary].collect()
        .groupBy(_.event_type).map { case (k, ss) => k -> ss.maxBy(_.n_events) }
      val batch = StreamQueries.rateLimitBatch(evs.toDF())
        .collect().map { r =>
          r.getAs[String]("event_type") ->
            ((r.getAs[Long]("n_events"), r.getAs[Long]("n_admitted"),
              r.getAs[Long]("n_throttled")))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, s0) =>
        assert((s0.n_events, s0.n_admitted, s0.n_throttled) == batch(k),
          s"key $k: streaming rate limit must equal the batch fold")
      }
      val slow = streamed("slow")
      assert(slow.n_throttled == 0L, "2h-spaced events never throttle")
      val fast = streamed("fast")
      assert(fast.n_throttled > 0L, "10min-spaced events must throttle")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("late-data auditor == batch running-max window, counts real lateness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    // two keys; arrival order deliberately out of ts order: every 5th
    // arrival carries an event time 45 min older than the running max
    // (late at a 30-min delay), others advance by 10 min each
    val evs = for {
      key <- Seq("x", "y")
      i <- 0 until 40
    } yield {
      val base = i.toLong * 10 * 60 * 1000000L
      LateEvent(key, i.toLong,
        if (i % 5 == 4) base - 45L * 60 * 1000000L else base)
    }
    val batches = evs.groupBy(_.arrival_seq / 15L).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[LateEvent]
    val q = StreamQueries.lateAuditStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("late_out").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("late_out").as[LateSummary].collect()
        .groupBy(_.event_type).map { case (k, ss) => k -> ss.maxBy(_.n_events) }
      val batch = StreamQueries.lateAuditBatch(evs.toDF())
        .collect().map { r =>
          r.getAs[String]("event_type") ->
            ((r.getAs[Long]("n_events"), r.getAs[Long]("n_late")))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, s0) =>
        assert((s0.n_events, s0.n_late) == batch(k),
          s"key $k: streaming late audit must equal the batch window run")
      }
      // every 5th arrival (after the first) is 45 min late: 8 per key
      assert(streamed.values.forall(_.n_late == 8L))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("EWMA anomaly maintainer == batch 16-tap window detector") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    // two keys, 60 events each: a smooth ramp with planted spikes at
    // every 20th event (far outside 2.5 sigma of the trailing 16)
    val evs = for {
      (key, base) <- Seq(("a", 10.0), ("b", 50.0))
      i <- 0 until 60
    } yield EwmaEvent(key, i.toLong + (if (key == "a") 0L else 1000L),
      i.toLong * 1000L,
      base + math.sin(i * 0.37) + (if (i % 20 == 19) 40.0 else 0.0))
    // three ts-ordered micro-batches (event-time order across batches)
    val batches = evs.groupBy(_.ts_us / 20000L).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[EwmaEvent]
    val q = StreamQueries.ewmaAnomalyStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("ewma_out").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("ewma_out").as[EwmaSummary].collect()
        .groupBy(_.event_type).map { case (k, ss) =>
          k -> ss.maxBy(_.n_scored)
        }
      val batch = StreamQueries.ewmaAnomalyBatch(
        evs.toDF()
          .withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros($"ts_us"))
          .drop("ts_us"))
        .collect().map { r =>
          r.getAs[String]("event_type") ->
            ((r.getAs[Long]("n_scored"), r.getAs[Long]("n_anom"),
              r.getAs[Double]("max_dev")))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, s0) =>
        assert((s0.n_scored, s0.n_anom, s0.max_dev) == batch(k),
          s"key $k: streaming EWMA summary must equal the batch window run")
      }
      // all three planted spikes (i = 19, 39, 59) land after the
      // 16-row warmup, and each is ~40 off a trailing window whose
      // 2.5 sigma never exceeds ~25 even when a prior spike inflates it
      assert(streamed.values.forall(_.n_anom >= 3L))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream_drift_psi: maintainer's completed days == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Graft.RocksDbProvider)
    val all = sampleEvents(800).sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
      val cents = BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
      PsiEvent(e.event_type, e.ts.getTime * 1000L / 86400000000L,
        math.min(cents / StreamQueries.PsiBinCents,
          StreamQueries.PsiBins - 1L))
    }
    val input = MemoryStream[PsiEvent]
    val (first, second) = all.splitAt(all.length / 2)
    val q = StreamQueries.psiDriftStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("psi_out").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("psi_out")
        .select(col("event_type"), col("day_idx"), col("n_events"),
          (round(col("psi"), 6) + lit(0.0)).as("psi"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val batch = StreamQueries.psiDriftBatch(all.toDS().toDF())
        .select(col("event_type"), col("day_idx"), col("n_events"), col("psi"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      // the maintainer can't close a key's LAST day (no later event
      // arrives to roll it over) — everything it DID close must match
      // the batch twin exactly, and per key exactly one batch day
      // (the final one) may be missing from the stream.
      assert(streamed.nonEmpty, "no completed days emitted")
      streamed.foreach { case (k, v) =>
        assert(batch.contains(k), s"streamed day $k unknown to batch twin")
        assert(batch(k) == v, s"day $k: streamed $v != batch ${batch(k)}")
      }
      val missing = batch.keySet -- streamed.keySet
      val lastPerType = batch.keys.groupBy(_._1).map { case (t, ks) =>
        t -> ks.map(_._2).max
      }
      assert(missing.forall { case (t, d) => lastPerType(t) == d },
        s"non-final batch days missing from the stream: $missing")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Custom as-of join operator: semantics vs hand-built cases, parity
  * with the window-composition path, and the physical plan shape.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("picks latest right row at-or-before each left time, else null") {
    val quotes = Seq(
      (1L, 10L, "q10"), (1L, 20L, "q20"), (1L, 30L, "q30"),
      (2L, 15L, "p15"))
      .toDF("key", "t", "quote")
    val trades = Seq(
      (1L, 5L, "early"), (1L, 20L, "at"), (1L, 25L, "mid"), (1L, 99L, "late"),
      (2L, 14L, "before"), (3L, 50L, "nokey"))
      .toDF("key", "t", "trade")
    val out = AsOfJoin.join(trades, quotes, "key", "t", "key", "t")
      .select(trades("key"), trades("t"), col("trade"), col("quote"))
      .orderBy(trades("key"), trades("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, "early", null), (1L, 20L, "at", "q20"), (1L, 25L, "mid", "q20"),
      (1L, 99L, "late", "q30"), (2L, 14L, "before", null), (3L, 50L, "nokey", null)))
  }

  test("tolerance nulls matches beyond the bound on both merge paths") {
    val quotes = Seq((1L, 10L, "q10"), (1L, 100L, "q100"), (2L, 50L, "p50"))
      .toDF("key", "t", "quote")
    val trades = Seq(
      (1L, 12L, "near"),   // Δ2  within tol 5 -> q10
      (1L, 40L, "far"),    // Δ30 beyond tol  -> null
      (1L, 100L, "exact"), // Δ0             -> q100
      (2L, 56L, "edge"))   // Δ6 beyond tol 5 -> null
      .toDF("key", "t", "trade")
    // primitive (long) path
    val out = AsOfJoin.join(trades, quotes, "key", "t", "key", "t",
        tolerance = Some(5L))
      .select(col("trade"), col("quote")).orderBy(trades("key"), trades("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("near", "q10"), ("far", null), ("exact", "q100"),
      ("edge", null)), s"got $out")
    // generic path (string key forces interpreted orderings)
    val tradesG = trades.withColumn("key", concat(lit("k"), col("key")))
    val quotesG = quotes.withColumn("key", concat(lit("k"), col("key")))
    val outG = AsOfJoin.join(tradesG, quotesG, "key", "t", "key", "t",
        tolerance = Some(5L))
      .select(tradesG("key"), tradesG("t"), col("trade"), col("quote"))
      .orderBy(tradesG("key"), tradesG("t"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSeq
    assert(outG == out, "generic path must apply the same tolerance")
    // forward: the blocked head beyond tolerance is no match
    val outF = AsOfJoin.join(trades, quotes, "key", "t", "key", "t",
        forward = true, tolerance = Some(5L))
      .select(col("trade"), col("quote")).orderBy(trades("key"), trades("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(outF == Seq(("near", null), ("far", null), ("exact", "q100"),
      ("edge", null)), s"forward got $outF")
  }

  test("tolerance with a non-numeric time type fails fast") {
    val df = Seq((1L, "a")).toDF("key", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(df, df, "key", "t", "key", "t", tolerance = Some(5L))
    }
    assert(e.getMessage.contains("tolerance"))
  }

  test("native as-of equals window-composition on real tables") {
    val native = RelationalQueries.queries("q23_asof_native")(spark, sfDir).collect().toSeq
    val composed = RelationalQueries.queries("q18_asof_join")(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("asof_orderkey")).collect().toSeq
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("pruning rule narrows a wide right table's scan schema") {
    val wideRight = Tables.load(spark, sfDir, "orders")  // all 6 columns
      .withColumn("o_time", col("o_orderdate").cast("timestamp_ntz"))
    val left = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val joined = AsOfJoin.join(left, wideRight, "user_id", "ts", "o_custkey", "o_time")
      .select(col("event_id"), col("o_orderkey"))
    val explained = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val ordersRead = explained.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("o_orderkey")).get
    assert(!ordersRead.contains("o_totalprice"),
      s"unused o_totalprice must be pruned from the scan: $ordersRead")
    assert(joined.count() > 0)
  }

  test("left-only predicates push below the as-of join to the scan") {
    val right = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp_ntz").as("o_time"))
    val left = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
    val joined = AsOfJoin.join(left, right, "user_id", "ts", "o_custkey", "o_time")
      .filter(col("event_type") === "click" && col("o_totalprice") > 0.0)
    val explained = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the left-only conjunct reaches the events scan as a parquet filter
    val eventsScan = explained.linesIterator
      .filter(_.contains("PushedFilters")).find(_.contains("event_type")).orNull
    assert(eventsScan != null && eventsScan.contains("EqualTo(event_type,click)"),
      s"left-only predicate must reach the events scan's PushedFilters:\n$explained")
    // the right-side conjunct must NOT be pushed into the orders scan —
    // it would change which order is "latest" and kill unmatched nulls
    val ordersScan = explained.linesIterator
      .filter(_.contains("PushedFilters")).find(_.contains("o_totalprice"))
    assert(!ordersScan.exists(_.contains("GreaterThan(o_totalprice")),
      s"right predicate must stay above the join:\n$ordersScan")
    // semantics unchanged: pushing left filters first gives the same rows
    val expected = AsOfJoin.join(
        left.filter(col("event_type") === "click"), right,
        "user_id", "ts", "o_custkey", "o_time")
      .filter(col("o_totalprice") > 0.0)
      .select(col("event_id"), col("o_orderkey")).collect().toSet
    val got = joined.select(col("event_id"), col("o_orderkey")).collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("pushdown and pruning compose: filtered projection gets both") {
    val wideRight = Tables.load(spark, sfDir, "orders")
      .withColumn("o_time", col("o_orderdate").cast("timestamp_ntz"))
    val left = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
    val joined = AsOfJoin.join(left, wideRight, "user_id", "ts", "o_custkey", "o_time")
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("o_orderkey"))
    val explained = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // pushdown: the filter reaches the events scan
    assert(explained.contains("EqualTo(event_type,click)"),
      s"filter must reach PushedFilters:\n$explained")
    // pruning: the wide orders table still reads only the used columns
    val ordersRead = explained.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("o_orderkey")).get
    assert(!ordersRead.contains("o_totalprice"),
      s"unused o_totalprice must stay pruned alongside pushdown: $ordersRead")
    assert(joined.count() > 0)
  }

  test("null keys and times never match (left nulls emit null right)") {
    val quotes = Seq((Some(1L), Some(10L), "q10"), (None, Some(5L), "qnull"),
      (Some(1L), None, "tnull"))
      .toDF("key", "t", "quote")
    val trades = Seq((Some(1L), Some(20L), "ok"), (None, Some(20L), "knull"),
      (Some(1L), None, "tnull"))
      .toDF("key", "t", "trade")
    val out = AsOfJoin.join(trades, quotes, "key", "t", "key", "t")
      .select(col("trade"), col("quote")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // only the fully non-null pair joins; null-key/time rows on either
    // side neither match nor crash
    assert(out == Set(("ok", "q10"), ("knull", null), ("tnull", null)))
  }

  test("int keys and times run the primitive path correctly") {
    val quotes = Seq((1, 10, "q10"), (1, 30, "q30")).toDF("key", "t", "quote")
    val trades = Seq((1, 20, "a"), (1, 35, "b"), (2, 40, "c")).toDF("key", "t", "trade")
    val out = AsOfJoin.join(trades, quotes, "key", "t", "key", "t")
      .select(col("trade"), col("quote")).orderBy(col("trade")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "q10"), ("b", "q30"), ("c", null)))
  }

  test("string keys run the generic orderable path correctly") {
    val quotes = Seq(("aapl", 10L, 100.0), ("aapl", 20L, 101.0), ("msft", 5L, 50.0))
      .toDF("sym", "t", "px")
    val trades = Seq(("aapl", 15L), ("aapl", 25L), ("goog", 9L), ("msft", 5L))
      .toDF("sym", "t")
    val out = AsOfJoin.join(trades, quotes, "sym", "t", "sym", "t")
      .select(trades("sym"), trades("t"), col("px"))
      .orderBy(trades("sym"), trades("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("aapl", 15L, 100.0), ("aapl", 25L, 101.0), ("goog", 9L, -1.0), ("msft", 5L, 50.0)))
  }

  test("mismatched key types fail fast with a clear message") {
    val l = Seq((1L, 1L)).toDF("key", "t")
    val r = Seq(("x", 1L)).toDF("key", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(l, r, "key", "t", "key", "t")
    }
    assert(e.getMessage.contains("types must match"))
  }

  test("pruning rule fires through an intervening Filter") {
    val wideRight = Tables.load(spark, sfDir, "orders")
      .withColumn("o_time", col("o_orderdate").cast("timestamp_ntz"))
    val left = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val joined = AsOfJoin.join(left, wideRight, "user_id", "ts", "o_custkey", "o_time")
      .filter(col("event_id") > 10)  // Filter between Project and as-of node
      .select(col("event_id"), col("o_orderkey"))
    val explained = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val ordersRead = explained.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("o_orderkey")).get
    assert(!ordersRead.contains("o_totalprice"),
      s"unused o_totalprice must be pruned through the Filter: $ordersRead")
    assert(joined.count() > 0)
  }

  test("forward direction picks the earliest right row at-or-after each left time") {
    val quotes = Seq((1L, 10L, "q10"), (1L, 30L, "q30"), (2L, 5L, "q5"))
      .toDF("key", "t", "quote")
    val trades = Seq((1L, 10L, "at"), (1L, 20L, "between"), (1L, 35L, "after"),
      (2L, 1L, "before"), (3L, 1L, "nokey"))
      .toDF("key", "t", "trade")
    val out = AsOfJoin.join(trades, quotes, "key", "t", "key", "t", forward = true)
      .select(col("trade"), col("quote")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("at" -> "q10", "between" -> "q30", "after" -> null,
      "before" -> "q5", "nokey" -> null))
  }

  test("nearest direction picks min |Δt|, ties prefer backward, on both paths") {
    val quotes = Seq((1L, 10L, "q10"), (1L, 30L, "q30"), (2L, 50L, "q50"))
      .toDF("key", "t", "quote")
    val trades = Seq(
      (1L, 12L, "closer_back"),  // |12-10|=2 < |30-12|=18
      (1L, 28L, "closer_fwd"),   // |28-10|=18 > |30-28|=2
      (1L, 20L, "tie"),          // |20-10| == |30-20| → backward q10
      (1L, 30L, "exact"),        // dist 0 both ways → same row
      (2L, 1L, "only_fwd"),      // nothing before → forward q50
      (2L, 99L, "only_back"),    // nothing after → backward q50
      (3L, 5L, "nokey"))
      .toDF("key", "t", "trade")
    val expected = Map("closer_back" -> "q10", "closer_fwd" -> "q30",
      "tie" -> "q10", "exact" -> "q30", "only_fwd" -> "q50",
      "only_back" -> "q50", "nokey" -> null)
    // primitive path (long key)
    val prim = AsOfJoin.joinNearest(trades, quotes, "key", "t", "key", "t")
      .select(col("trade"), col("quote")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(prim == expected)
    // generic path (string key, long-backed time)
    val sq = quotes.withColumn("key", concat(lit("k"), col("key")))
    val st = trades.withColumn("key", concat(lit("k"), col("key")))
    val gen = AsOfJoin.joinNearest(st, sq, "key", "t", "key", "t")
      .select(col("trade"), col("quote")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(gen == expected)
  }

  test("nearest rejects a non-numeric time type with a clear error") {
    val l = Seq((1L, "a")).toDF("key", "t")
    val r = Seq((1L, "b")).toDF("key", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinNearest(l, r, "key", "t", "key", "t")
    }
    assert(e.getMessage.contains("long-backed time"))
  }

  test("composite keys match lexicographically across mixed types") {
    val quotes = Seq(
      (1L, "a", 10L, "1a10"), (1L, "a", 20L, "1a20"),
      (1L, "b", 15L, "1b15"), (2L, "a", 5L, "2a5"))
      .toDF("k1", "k2", "t", "quote")
    val trades = Seq(
      (1L, "a", 25L, "t1"),  // → 1a20
      (1L, "b", 14L, "t2"),  // nothing ≤ 14 for (1,b)... 15 > 14 → null
      (1L, "b", 15L, "t3"),  // → 1b15
      (2L, "a", 99L, "t4"),  // → 2a5
      (2L, "b", 99L, "t5"))  // no such key pair → null
      .toDF("k1", "k2", "t", "trade")
    val out = AsOfJoin.joinMulti(trades, quotes,
        Seq("k1", "k2"), "t", Seq("k1", "k2"), "t")
      .select(col("trade"), col("quote")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("t1" -> "1a20", "t2" -> null, "t3" -> "1b15",
      "t4" -> "2a5", "t5" -> null))
    // a null in ANY key component never matches
    val qn = Seq((Some(1L), Some("a"), 10L, "q")).toDF("k1", "k2", "t", "quote")
    val tn = Seq((Some(1L), None: Option[String], 20L, "knull"))
      .toDF("k1", "k2", "t", "trade")
    val out2 = AsOfJoin.joinMulti(tn, qn, Seq("k1", "k2"), "t",
        Seq("k1", "k2"), "t")
      .select(col("trade"), col("quote")).head()
    assert(out2.getString(0) == "knull" && out2.isNullAt(1))
  }

  test("mismatched key-list lengths fail fast") {
    val l = Seq((1L, 1L)).toDF("key", "t")
    val r = Seq((1L, 1L)).toDF("key", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinMulti(l, r, Seq("key"), "t", Seq("key", "t"), "t")
    }
    assert(e.getMessage.contains("matching non-empty key lists"))
  }

  test("q23 shuffles orders exactly once (agg reuses the join's partitioning)") {
    val df = RelationalQueries.queries("q23_asof_native")(spark, sfDir)
    df.collect()
    // AQE's toString appends the Initial Plan — count the final only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the orders side repartitions by o_custkey BEFORE the groupBy, so
    // hash(o_custkey) satisfies both the agg's clustering and the
    // as-of distribution — a second orders exchange is a regression
    val ordersExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(o_custkey")).size
    assert(ordersExchanges == 1,
      s"expected exactly one orders-side exchange, got $ordersExchanges:\n${plan.take(2500)}")
  }

  test("physical plan uses AsOfJoinExec with shuffles on the key") {
    val df = RelationalQueries.queries("q23_asof_native")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
  }

  test("primitive merge fuses into whole-stage codegen, parity with interpreted") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import graft.plans.AsOfJoinExec
    val quotes = Seq(
      (1L, 10L, "q10"), (1L, 20L, "q20"), (1L, 30L, "q30"), (2L, 15L, "p15"))
      .toDF("key", "t", "quote")
    val trades = Seq(
      (1L, 5L, "early"), (1L, 20L, "at"), (1L, 25L, "mid"), (1L, 99L, "late"),
      (2L, 14L, "before"), (3L, 50L, "nokey"))
      .toDF("key", "t", "trade")
    def run(dir: String, tol: Option[Long]) = {
      val d = dir match {
        case "fwd" => AsOfJoin.join(trades, quotes, "key", "t", "key", "t",
          forward = true, tolerance = tol)
        case "near" if tol.isEmpty =>
          AsOfJoin.joinNearest(trades, quotes, "key", "t", "key", "t")
        case _ => AsOfJoin.join(trades, quotes, "key", "t", "key", "t",
          tolerance = tol)
      }
      d.select(col("trade"), col("quote")).orderBy(col("trade"))
    }
    // fallback=false: a codegen compile error now throws instead of
    // silently running the interpreted path
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cases = Seq(("back", None), ("back", Some(5L)),
        ("fwd", None), ("fwd", Some(5L)), ("near", None))
      val withCodegen = cases.map { case (d, t) =>
        val df = run(d, t)
        val rows = df.collect().toSeq // materialize so AQE finalizes stages
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
          s"as-of ($d, tol=$t) must fuse into a WholeStageCodegen stage:\n" +
            plan.take(1200))
        rows
      }
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = cases.map { case (d, t) => run(d, t).collect().toSeq }
      assert(withCodegen == interpreted,
        "generated merge must agree with the interpreted merge")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("string and composite keys fuse into whole-stage codegen too") {
    val quotes = Seq(("a", 1L, 10L, "q10"), ("a", 1L, 30L, "q30"),
      ("b", 2L, 15L, "p15"))
      .toDF("s", "key", "t", "quote")
    val trades = Seq(("a", 1L, 5L, "early"), ("a", 1L, 35L, "late"),
      ("b", 2L, 14L, "before"), ("b", 2L, 16L, "after"), ("c", 3L, 50L, "nokey"))
      .toDF("s", "key", "t", "trade")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      def run(tol: Option[Long]) = AsOfJoin.joinMulti(
        trades, quotes, Seq("s", "key"), "t", Seq("s", "key"), "t",
        tolerance = tol)
        .select(col("trade"), col("quote")).orderBy(col("trade"))
      Seq(None, Some(5L)).foreach { tol =>
        val df = run(tol)
        val rows = df.collect().toSeq
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
          s"composite (string, long) keys must fuse (tol=$tol):\n${plan.take(1200)}")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val interp = run(tol).collect().toSeq
        spark.conf.unset("spark.sql.codegen.wholeStage")
        assert(rows == interp, s"generic codegen diverged (tol=$tol)")
      }
      // expected matches incl. the unmatched-left null
      val base = run(None).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(base == Seq(("after", "p15"), ("before", null),
        ("early", null), ("late", "q30"), ("nokey", null)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("array and struct keys fuse into whole-stage codegen") {
    // array keys: the cached head/match keys are copy()-detached from
    // the sorter's reused buffer — a stale view would corrupt matches
    val quotes = Seq((Seq(1L, 2L), 10L, "q10"), (Seq(1L, 2L), 30L, "q30"),
      (Seq(2L, 1L), 15L, "p15"))
      .toDF("key", "t", "quote")
    val trades = Seq((Seq(1L, 2L), 5L, "early"), (Seq(1L, 2L), 35L, "late"),
      (Seq(2L, 1L), 16L, "after"), (Seq(3L, 3L), 50L, "nokey"))
      .toDF("key", "t", "trade")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      def run(tol: Option[Long]) = AsOfJoin.join(
        trades, quotes, "key", "t", "key", "t", tolerance = tol)
        .select(col("trade"), col("quote")).orderBy(col("trade"))
      Seq(None, Some(5L)).foreach { tol =>
        val df = run(tol)
        val rows = df.collect().toSeq
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
          s"array keys must fuse (tol=$tol):\n${plan.take(1200)}")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val interp = run(tol).collect().toSeq
        spark.conf.unset("spark.sql.codegen.wholeStage")
        assert(rows == interp, s"array-key codegen diverged (tol=$tol)")
      }
      val base = run(None).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(base == Seq(("after", "p15"), ("early", null),
        ("late", "q30"), ("nokey", null)))

      // struct keys take the same generated comparator path
      val qs = Seq((("a", 1L), 10L, "s10"), (("a", 1L), 30L, "s30"),
        (("b", 2L), 15L, "s15"))
        .toDF("key", "t", "quote")
      val ts = Seq((("a", 1L), 12L, "mid"), (("b", 2L), 14L, "before"))
        .toDF("key", "t", "trade")
      val df2 = AsOfJoin.join(ts, qs, "key", "t", "key", "t")
        .select(col("trade"), col("quote")).orderBy(col("trade"))
      val rows2 = df2.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val plan2 = df2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan2).isDefined,
        s"struct keys must fuse:\n${plan2.take(1200)}")
      assert(rows2 == Seq(("before", null), ("mid", "s10")))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("decimal keys fuse into codegen; non-long time is the pinned fallback") {
    val quotes = Seq((BigDecimal("1.50"), 10L, "q10"),
      (BigDecimal("1.50"), 30L, "q30"), (BigDecimal("2.25"), 15L, "p15"))
      .toDF("key", "t", "quote")
    val trades = Seq((BigDecimal("1.50"), 5L, "early"),
      (BigDecimal("1.50"), 35L, "late"), (BigDecimal("2.25"), 14L, "before"),
      (BigDecimal("3.75"), 50L, "nokey"))
      .toDF("key", "t", "trade")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      def run(tol: Option[Long]) = AsOfJoin.join(
        trades, quotes, "key", "t", "key", "t", tolerance = tol)
        .select(col("trade"), col("quote")).orderBy(col("trade"))
      Seq(None, Some(5L)).foreach { tol =>
        val df = run(tol)
        val rows = df.collect().toSeq
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
          s"decimal keys must fuse (tol=$tol):\n${plan.take(1200)}")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val interp = run(tol).collect().toSeq
        spark.conf.unset("spark.sql.codegen.wholeStage")
        assert(rows == interp, s"decimal codegen diverged (tol=$tol)")
      }
      val base = run(None).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(base == Seq(("before", null), ("early", null),
        ("late", "q30"), ("nokey", null)))

      // POLICY PIN: a decimal (non-long-backed) TIME must NOT silently
      // fuse — it takes the interpreted merge, and still answers right.
      // (codegen.fallback=false stays set: if this shape ever tried to
      // generate and failed, the test would throw instead of masking.)
      val qt = Seq((1L, BigDecimal("10.0"), "q10"), (1L, BigDecimal("30.0"), "q30"))
        .toDF("key", "t", "quote")
      val tr = Seq((1L, BigDecimal("5.0"), "early"), (1L, BigDecimal("35.0"), "late"))
        .toDF("key", "t", "trade")
      val df2 = AsOfJoin.join(tr, qt, "key", "t", "key", "t")
        .select(col("trade"), col("quote")).orderBy(col("trade"))
      val rows2 = df2.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val plan2 = df2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan2).isEmpty &&
        plan2.contains("AsOfJoin"),
        s"decimal time must take the interpreted AsOfJoin:\n${plan2.take(1200)}")
      assert(rows2 == Seq(("early", null), ("late", "q30")))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}

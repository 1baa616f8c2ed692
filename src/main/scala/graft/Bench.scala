package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology (r2):
  *   - Each query runs once at sf0.001 first to pay JVM/codegen
  *     warm-up outside the measurement (cold-start noise was ±5× per
  *     query otherwise).
  *   - Each query then runs SPARK_GRAFT_TRIALS times (default 3) at
  *     the target SF; the JSON reports the per-query MEDIAN plus
  *     min/max, so one co-tenant stall doesn't poison the number
  *     (BENCH_r01 showed 30× swings on this machine).
  *   - Queries are forced through a `noop` sink, not `.count()`: under
  *     a count Catalyst prunes unused result columns — for q18-style
  *     window queries that deleted the entire window computation and
  *     benchmarked an empty shell. The noop write materializes every
  *     output column without driver collection.
  *   - A query that throws is reported in an explicit "errors" map
  *     (name → exception class+message) and its time is excluded from
  *     the total; failures are never silently folded into timings.
  */
object Bench {

  /** Force full computation of every output column, no driver collect. */
  private def exhaust(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    // optional comma-separated subset for focused local iteration; the
    // driver sets no filter and measures everything
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    ordered.foreach { case (_, fn) =>
      try exhaust(fn(spark, warmDir)) catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = ordered.flatMap { case (name, fn) =>
      val times = (1 to trials).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          exhaust(fn(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
            None
        }
      }
      // Between queries, nudge the JVM so Spark's ContextCleaner can
      // drop checkpoint blocks whose owners (e.g. finished ECS worlds)
      // are no longer referenced. Without this, block-manager residue
      // from earlier queries inflates later ones in the shared JVM —
      // measured 50.9s-vs-0.9s on knn_binary_hamming at sf1 depending
      // on what ran before it (BENCH_r06_sf1.json note).
      System.gc()
      if (times.isEmpty) None
      else Some((name, median(times), times.min, times.max))
    }
    def fmt(d: Double): String = f"$d%.3f"
    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, mn, mx) =>
      "\"" + k + "\":[" + fmt(mn) + "," + fmt(mx) + "]"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the driver captures stdout as a log tail, and BENCH_r04 lost 97 of
    // 155 per-query medians to mid-JSON truncation — so the printed line
    // carries only the medians map (the gate's contract), while the FULL
    // artifact (medians + min/max spread) is persisted as parsed JSON on
    // disk, machine-readable regardless of how the log was clipped
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","trials":$trials,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","trials":$trials,"queries":$qs,"spread":$spread,"errors":$errJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/bench_full.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}

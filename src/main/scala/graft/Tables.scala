package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables. */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions that read `events` need TIMESTAMP(NANOS) surfaced as raw
    * longs; prefer setting this at session construction (all graft
    * mains and specs do) — `load` only falls back to setting it for
    * externally-built sessions, and only when unset.
    */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The generator has shipped `ts` under several physical parquet
      // encodings over time (TIMESTAMP(NANOS), timestamp[us],
      // timestamp[ms], raw INT64 epochs). A real engine is
      // physical-type-agnostic: branch on the type Spark actually
      // loaded and normalize to timestamp_ntz, which is what every
      // downstream query consumes. All values are micro-precision, so
      // each conversion below is exact.
      if (spark.conf.get(NanosAsLongKey, "false") != "true")
        spark.conf.set(NanosAsLongKey, "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types._
      val ts = raw.schema("ts").dataType match {
        case LongType =>
          // TIMESTAMP(NANOS) surfaced as raw nanos via nanosAsLong.
          timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType)
        case _: TimestampNTZType => col("ts")
        case _: TimestampType    => col("ts").cast(TimestampNTZType)
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported physical type $other")
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")
}

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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as raw nanos and convert (exact: the
      // generator writes microsecond-precision values).
      if (spark.conf.get(NanosAsLongKey, "false") != "true")
        spark.conf.set(NanosAsLongKey, "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000"))
          .cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")
}

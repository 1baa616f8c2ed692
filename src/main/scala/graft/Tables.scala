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
          // Two encodings surface as LongType: TIMESTAMP(NANOS) via
          // nanosAsLong, and a raw INT64 epoch. The Spark schema can't
          // tell them apart — the parquet footer's logical-type
          // annotation can.
          if (tsAnnotatedNanos(spark, s"$dir/$name.parquet"))
            timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType)
          else // unannotated INT64: the generator's raw epoch micros
            timestamp_micros(col("ts")).cast(TimestampNTZType)
        case _: TimestampNTZType => col("ts")
        case _: TimestampType    => col("ts").cast(TimestampNTZType)
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported physical type $other")
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** True iff the parquet footer annotates `ts` as TIMESTAMP with
    * NANOS unit. `path` may be a single parquet file or a directory of
    * part files (the first footer decides — one writer per dataset).
    */
  private[graft] def tsAnnotatedNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).minBy(_.getName.toString)
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) return false
      schema.getType(Seq("ts"): _*).getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == TimeUnit.NANOS
        case _ => false
      }
    } finally reader.close()
  }
}

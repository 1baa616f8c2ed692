package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The lesson of round 5: the generator re-encoded events.ts between
  * rounds (parquet TIMESTAMP(NANOS) → timestamp[us]) and a loader
  * welded to one physical encoding silently broke 41 queries. This
  * spec is the contract that can never happen again: the SAME events
  * rows are written under every encoding the generator has shipped —
  * TIMESTAMP(NANOS), timestamp[us] (TIMESTAMP_NTZ), and raw
  * unannotated INT64 epoch micros — and real events-fed queries
  * (as-of join, time bucket, streaming window agg) must return
  * identical results through Tables.load on all of them.
  */
class EventsSchemaContractSpec extends SparkSpec {

  private val otherTables = Tables.All.filterNot(_ == "events")

  /** tmp sf-dir with real sf0.001 tables + events re-encoded by `writeEvents`. */
  private def mkDir(tag: String)(writeEvents: String => Unit): String = {
    val dir = TmpDir.scratch(s"events_contract_$tag")
    Files.createDirectories(Paths.get(dir))
    otherTables.foreach { t =>
      Files.copy(Paths.get(s"$sfDir/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    writeEvents(s"$dir/events.parquet")
    dir
  }

  // canonical rows straight off the real testdata (micros precision)
  private lazy val canonical = Tables.load(spark, sfDir, "events")
    .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    .orderBy("event_id").collect()

  private def writeNanos(path: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(PrimitiveTypeName.INT64).named("user_id")
      .required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(PrimitiveTypeName.DOUBLE).named("value")
      .required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withType(schema)
      .withConf(spark.sessionState.newHadoopConf())
      .build()
    try canonical.foreach { r =>
      val g = factory.newGroup()
      g.add("event_id", r.getLong(0))
      g.add("ts", r.getLong(1) * 1000L) // micros → nanos, exact
      g.add("user_id", r.getLong(2))
      g.add("event_type", r.getString(3))
      g.add("value", r.getDouble(4))
      g.add("props", r.getString(5))
      writer.write(g)
    } finally writer.close()
  }

  private def sparkEvents = {
    val rows = canonical.toSeq
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      Tables.load(spark, sfDir, "events").select(
        col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props")).schema)
    df
  }

  private def writeMicrosNtz(path: String): Unit =
    sparkEvents
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(path)

  private def writeInt64Micros(path: String): Unit =
    sparkEvents
      .withColumn("ts", col("us"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(path)

  private lazy val dirs: Map[String, String] = Map(
    "nanos" -> mkDir("nanos")(writeNanos),
    "us_ntz" -> mkDir("us-ntz")(writeMicrosNtz),
    "int64_us" -> mkDir("int64-us")(writeInt64Micros))

  test("Tables.load normalizes every historical ts encoding to timestamp_ntz") {
    dirs.foreach { case (tag, dir) =>
      val loaded = Tables.load(spark, dir, "events")
      assert(loaded.schema("ts").dataType.typeName == "timestamp_ntz",
        s"$tag: ts loaded as ${loaded.schema("ts").dataType}")
      val got = loaded
        .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy("event_id").collect()
      assert(got.length == canonical.length, s"$tag: row count")
      assert(got.sameElements(canonical), s"$tag: row values diverge")
    }
  }

  for (q <- Seq("q18_asof_join", "q20_time_bucket", "stream_window_agg")) {
    test(s"$q returns identical results under all three ts encodings") {
      def run(dir: String): Seq[Row] =
        SparkEntry.queries(q)(spark, dir).collect().toSeq
      val base = run(dirs("us_ntz"))
      assert(base.nonEmpty, "baseline returned no rows")
      for (tag <- Seq("nanos", "int64_us")) {
        val got = run(dirs(tag))
        assert(got == base,
          s"$q under $tag diverges from us_ntz: got ${got.take(2)} vs ${base.take(2)}")
      }
    }
  }
}

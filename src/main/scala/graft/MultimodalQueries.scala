package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column suite (SURVEY §2.F): media payloads as opaque
  * `binary` columns with typed metadata structs. The decode step is
  * STUBBED (no image/audio libs in this container) behind
  * [[MultimodalQueries.decodeStub]]; the Spark-side plumbing — binary
  * columns, metadata schema, deterministic frame partitioning, batch
  * shape — is real and oracle-/spec-tested.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Typed metadata for an opaque media payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_code", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  // F1 — binary payload + typed metadata extraction, flattened.
  private def mmBinaryMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        ascii(col("text")).cast("long").as("first_code"),
        md5(col("payload")).as("payload_md5")))
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
        col("meta.first_code").as("first_code"), col("meta.payload_md5").as("payload_md5"))
      .orderBy(col("doc_id"))

  private val mmBinaryMetaSql =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | CAST(ascii(text) AS BIGINT) AS first_code,
      | md5(text) AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // F2 — frame sampling: 16-byte frames off the payload, every 4th
  // frame kept — deterministic partition-friendly explode; the frame
  // "decode" is the stub below.
  private def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        posexplode(expr(
          """transform(
            |  sequence(0, CAST(floor((length(text) - 1) / 16) AS INT)),
            |  i -> substring(text, i * 16 + 1, 16))""".stripMargin))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame").cast("binary")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** STUB decode: where a real pipeline would run an image/audio
    * decoder over each binary payload (the libs are absent here), we
    * partition-map a deterministic fake "decoded feature" — the
    * distributed shape (mapPartitions over binary payloads, one output
    * row per input, fixed-width feature vector) is the real contract.
    */
  def decodeStub(df: DataFrame, payloadCol: String, featureDim: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadCol)
        // ??? real decoder goes here; deterministic fake: byte-sum folds
        val feats = Array.tabulate(featureDim) { k =>
          payload.iterator.zipWithIndex
            .filter(_._2 % featureDim == k).map(_._1.toInt & 0xff).sum.toDouble
        }
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private val mmFrameSampleSql =
    """SELECT doc_id, i AS frame_idx,
      | CAST(octet_length(encode(substring(text, CAST(i * 16 + 1 AS INT), 16))) AS BIGINT) AS frame_bytes,
      | md5(substring(text, CAST(i * 16 + 1 AS INT), 16)) AS frame_md5
      |FROM documents, LATERAL (
      |  SELECT unnest(generate_series(0, CAST(floor((length(text) - 1) / 16) AS BIGINT))) AS i) t
      |WHERE i % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_frame_sample" -> (mmFrameSample _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql)
}

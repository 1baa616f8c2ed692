package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink suite (SURVEY §2.H): parquet→JSON→CSV→parquet
  * round-trip preserving schema and values, verified by aggregating
  * the round-tripped data against the original table's oracle.
  */
object SourceQueries {

  private val RoundtripSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_returnflag", StringType)))

  private def srcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip_${java.util.UUID.randomUUID().toString.take(8)}"
    val base = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    base.write.mode("overwrite").json(s"$tmp/json")
    val fromJson = s.read.schema(RoundtripSchema).json(s"$tmp/json")
    fromJson.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val fromCsv = s.read.schema(RoundtripSchema).option("header", "true").csv(s"$tmp/csv")
    fromCsv.write.mode("overwrite").parquet(s"$tmp/parquet")
    s.read.parquet(s"$tmp/parquet")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  private val srcRoundtripSql =
    """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_roundtrip" -> (srcRoundtrip _))

  val oracles: Map[String, String] = Map(
    "src_roundtrip" -> srcRoundtripSql)
}

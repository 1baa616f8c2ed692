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

  // H2 — ORC round-trip: the other columnar format Spark ships
  // natively. Writes orders to ORC sorted within partitions by the
  // filter key (so ORC row-group min/max stats prune the predicate on
  // read-back, the same stats story as parquet), reads it back with
  // a pushed filter, and aggregates.
  private def srcOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .sortWithinPartitions(col("o_totalprice"))
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .filter(col("o_totalprice") >= 200000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val srcOrcRoundtripSql =
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total,
      | round(avg(o_totalprice), 4) AS avg_price
      |FROM orders WHERE o_totalprice >= 200000.0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // H3 — hive-partitioned layout + partition pruning: write orders
  // partitioned by o_orderstatus (the coarse-selectivity column a
  // 100 TB table would be laid out on), then read back ONE partition.
  // The status predicate is a partition filter — resolved against the
  // directory listing at planning, so the other partitions' files are
  // never opened (SourcePruningSpec asserts the plan reads only the
  // matching partition). Aggregation is per order-month on the pruned
  // read-back.
  private def srcPartitionedWrite(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("o_orderstatus") === "F")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_month"))
  }

  private val srcPartitionedWriteSql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n,
      | round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_roundtrip" -> (srcRoundtrip _),
    "src_orc_roundtrip" -> (srcOrcRoundtrip _),
    "src_partitioned_write" -> (srcPartitionedWrite _))

  val oracles: Map[String, String] = Map(
    "src_roundtrip" -> srcRoundtripSql,
    "src_orc_roundtrip" -> srcOrcRoundtripSql,
    "src_partitioned_write" -> srcPartitionedWriteSql)
}

package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._

/** Partition pruning on the hive-partitioned layout (H3): the status
  * predicate must be resolved against the directory structure at
  * planning — files of other partitions are never opened. Proven two
  * ways: the physical plan carries it as a PartitionFilter (not a
  * data filter), and behaviorally — after corrupting every file in
  * the other partitions, the pruned read still succeeds while a
  * full-table read fails.
  */
class SourcePruningSpec extends SparkSpec {

  private def writePartitioned(): String = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_prune_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
    tmp
  }

  test("status predicate is a partition filter, not a data filter") {
    val tmp = writePartitioned()
    val df = spark.read.parquet(tmp).filter(col("o_orderstatus") === "F")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("o_orderstatus#") &&
      plan.contains("= F"),
      s"expected a partition filter on o_orderstatus in:\n$plan")
    // the data-filter slot must NOT re-check the partition column
    val pushed = "PushedFilters: \\[(.*?)\\]".r.findFirstMatchIn(plan).map(_.group(1))
    assert(!pushed.exists(_.contains("o_orderstatus")),
      s"partition predicate leaked into PushedFilters: $pushed")
  }

  test("pruned read never opens the other partitions' files") {
    val tmp = writePartitioned()
    // corrupt every parquet file outside o_orderstatus=F
    Files.walk(Paths.get(tmp)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("o_orderstatus=F"))
      .foreach(p => Files.write(p, "not parquet".getBytes))

    val pruned = spark.read.parquet(tmp)
      .filter(col("o_orderstatus") === "F")
      .agg(count(lit(1))).head().getLong(0)
    val expected = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned == expected, "pruned partition must read intact")

    // sanity: a full-table read DOES touch the corrupted files
    intercept[Throwable] {
      spark.read.parquet(tmp).agg(sum(col("o_totalprice"))).head()
    }
  }
}

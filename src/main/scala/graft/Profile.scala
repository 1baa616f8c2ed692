package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing (dev tool): runs each named query twice
  * (warm-up + measured) on the given SF dir.
  * Usage: runMain graft.Profile <sfDir> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_cluster")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").count() // warm
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      println(f"[profile] $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    spark.stop()
  }
}

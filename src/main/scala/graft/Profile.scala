package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for hotspot queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = Tables.load(spark, dir, "documents")
    val tokensCol = expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    time("read+count")(docs.count())
    val shingleRows = docs.withColumn("toks", tokensCol)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(
          |  sequence(0, greatest(size(toks) - 3, 0)),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3))))""".stripMargin)).as("shingle"))
    time("shingle explode")(shingleRows.count())
    val hashed = shingleRows.select(col("doc_id") +:
      (0 until 64).map(j => xxhash64(col("shingle"), lit(j)).as(s"h$j")): _*)
    time("hash 64 cols")(hashed.count())
    val sig = hashed.groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"), (1 until 64).map(j => min(col(s"h$j")).as(s"m$j")): _*)
    time("sig agg")(sig.count())
    val bandCols = (0 until 8).map { b =>
      xxhash64(((b * 8) until (b * 8 + 8)).map(j => col(s"m$j")) :+ lit(b): _*)
    }
    val bands = sig.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_id", "band_hash")))
    time("bands")(bands.count())
    val a = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
    val b = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"))
    val pairs = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    time("pairs")(pairs.count())
    time("full query")(DedupQueries.queries("dedup_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}

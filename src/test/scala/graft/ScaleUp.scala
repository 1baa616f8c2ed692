package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-scale dataset (10× sf0.1) for the scaling probe:
  * each fact table is replicated 10 times with every entity key shifted
  * by copy·OFF, so referential joins (orders→customer, lineitem→orders/
  * part/supplier, events→customer) stay 1:1 instead of fanning out,
  * and per-key cardinalities match a genuinely bigger dataset. The
  * nation/region dimensions keep their natural size, exactly like a
  * real TPC-H scale-up. Values (prices, texts, vectors) repeat — this
  * is a PERFORMANCE decade, not an oracle surface; the correctness gate
  * stays at sf0.001/sf0.01.
  *
  *   sbt "Test/runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10"
  */
object ScaleUp {

  private val OFF = 100000000L // far above any sf0.1 key

  /** Which columns are entity keys (shift by copy·OFF) per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS): read it as raw longs (exactly as
      // Tables.load does) and write it back as BIGINT — `ts DIV 1000`
      // conversion downstream handles both encodings
      .config(Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scaled(table: String): DataFrame = {
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      keyCols.get(table) match {
        case None => df // dimensions keep natural size
        case Some(keys) =>
          val copies = spark.range(factor).select(col("id").as("_copy"))
          keys.foldLeft(df.crossJoin(copies)) { (d, k) =>
            d.withColumn(k, col(k) + col("_copy") * OFF)
          }.drop("_copy")
      }
    }

    (keyCols.keySet ++ Seq("region", "nation")).toSeq.sorted.foreach { t =>
      val out = s"$outDir/$t.parquet"
      scaled(t).write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(s"[scaleup] $t: $n rows -> $out")
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary training as DataFrame ops.
  *
  * Classic BPE over word types (word → frequency, tokenized to
  * characters): each round counts adjacent token pairs weighted by
  * word frequency, picks the most frequent pair (ties broken
  * lexicographically), and greedily merges it left-to-right in every
  * word. The learned artifact is the ordered merge table.
  *
  * Distributed shape: pair counting is explode + hash aggregation over
  * the word-type table (NOT the corpus — word types are the classic
  * BPE compression of the input, orders of magnitude smaller); the
  * winning pair is one driver-side scalar per round — the same
  * O(rounds) synchronization k-means training has. The greedy merge is
  * a left-to-right `aggregate` fold over each word's token array,
  * exactly reproducible in DuckDB's list_reduce (the oracle replays
  * the whole loop, including pair selection, as chained CTEs).
  */
object BpeTrainer {

  /** One learned merge. */
  final case class Merge(rank: Long, pa: String, pb: String, weight: Long)

  /** Greedy left-to-right application of merge (a, b) over `toks`.
    * "aaa" with pair (a,a) becomes [aa, a] — fold semantics, standard
    * BPE greedy application. Tokens are [a-z0-9]+ so literal embedding
    * in the expression is safe.
    */
  private def mergeFold(a: String, b: String) = expr(
    s"""aggregate(toks, cast(array() as array<string>),
       | (acc, x) -> CASE
       |   WHEN size(acc) > 0 AND element_at(acc, size(acc)) = '$a' AND x = '$b'
       |   THEN concat(slice(acc, 1, size(acc) - 1), array('$a$b'))
       |   ELSE concat(acc, array(x)) END)""".stripMargin)

  /** Train `nMerges` BPE merges over a (word, cnt) word-type table.
    * Returns the merge table (merge_rank, pa, pb, merged, weight).
    */
  def train(wordCounts: DataFrame, nMerges: Int): DataFrame = {
    val spark = wordCounts.sparkSession
    var words = wordCounts.withColumn("toks",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select(col("word"), col("cnt"), col("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    val pairExpr = expr(
      """transform(sequence(1, size(toks) - 1),
        | i -> struct(element_at(toks, i) AS pa, element_at(toks, i + 1) AS pb))""".stripMargin)
    // The per-round pair-count aggregate is the FIRST scan of the
    // round's word table, so it is also what populates that table's
    // cache — the previous round's parent can only be released after
    // it runs (unpersisting earlier would let the lazy fold chain
    // recompute through the whole merge history). Riding the cache
    // materialization on that aggregate instead of a dedicated
    // `count()` halves the jobs per round (one, not two) and skips
    // the FINAL round's fold outright (its output is never scanned —
    // only the merge table leaves this function).
    var prev: Option[DataFrame] = None
    for (k <- 1 to nMerges) {
      val best = words.filter(size(col("toks")) >= 2)
        .select(col("cnt"), explode(pairExpr).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("pa"), col("pb"))
        .limit(1).collect()
      prev.foreach(_.unpersist(false))
      prev = None
      if (best.nonEmpty) {
        val r = best.head
        val (pa, pb, wt) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += Merge(k.toLong, pa, pb, wt)
        val next = words
          .withColumn("toks", mergeFold(pa, pb))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(words)
        words = next
      }
    }
    words.unpersist(false)
    prev.foreach(_.unpersist(false))
    mergesToDf(spark, merges.toSeq)
  }

  /** Train `nMerges` BPE merges INDEPENDENTLY per group over a
    * (groupCol, word, cnt) word-type table, with every group's
    * per-round work fused into ONE job: the round's pair counts
    * aggregate grouped by (group, pa, pb), each group's winner falls
    * out of a per-group `min(struct(-weight, pa, pb))` (≡ ORDER BY
    * weight DESC, pa, pb LIMIT 1 — struct ordering is lexicographic
    * and string comparison is the same binary UTF8 order), and every
    * group's merge applies in one pass through a per-group CASE over
    * the same greedy fold. Merge tables are bit-identical to running
    * [[train]] once per group (same counts — the group key rides the
    * aggregation; same argmax; same fold), but the merge loop
    * synchronizes `nMerges` times instead of `nMerges · |groups|`
    * (r11, VERDICT r10 ask #6: the four per-language chains were 16
    * collect-sync jobs; each job's fixed scheduling cost, not the
    * aggregation, dominated text_bpe_perlang's 6.2 s wall).
    *
    * A group with no pair in some round keeps its word table
    * unchanged that round and receives no merge — exactly [[train]]'s
    * "no pair found → no merge" behavior.
    */
  def trainGrouped(wordCounts: DataFrame, groupCol: String,
      nMerges: Int): Map[String, Seq[Merge]] = {
    var words = wordCounts.withColumn("toks",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select(col(groupCol).as("__grp"), col("word"), col("cnt"), col("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[Merge]]
    val pairExpr = expr(
      """transform(sequence(1, size(toks) - 1),
        | i -> struct(element_at(toks, i) AS pa, element_at(toks, i + 1) AS pb))""".stripMargin)
    var prev: Option[DataFrame] = None
    for (k <- 1 to nMerges) {
      val best = words.filter(size(col("toks")) >= 2)
        .select(col("__grp"), col("cnt"), explode(pairExpr).as("p"))
        .groupBy(col("__grp"), col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("cnt")).as("weight"))
        .groupBy(col("__grp"))
        .agg(min(struct((col("weight") * lit(-1L)).as("nw"),
          col("pa"), col("pb"))).as("b"))
        .select(col("__grp"), col("b.pa"), col("b.pb"),
          (col("b.nw") * lit(-1L)).as("weight"))
        .collect()
      prev.foreach(_.unpersist(false))
      prev = None
      if (best.nonEmpty) {
        val winners = best.map(r => r.getString(0) ->
          ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
        winners.foreach { case (g, (pa, pb, wt)) =>
          merges.getOrElseUpdate(g,
            scala.collection.mutable.ArrayBuffer.empty[Merge]) +=
            Merge(k.toLong, pa, pb, wt)
        }
        var tokCol: org.apache.spark.sql.Column = col("toks")
        winners.toSeq.sortBy(_._1).foreach { case (g, (pa, pb, _)) =>
          tokCol = when(col("__grp") === lit(g), mergeFold(pa, pb))
            .otherwise(tokCol)
        }
        val next = words.withColumn("toks", tokCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(words)
        words = next
      }
    }
    words.unpersist(false)
    prev.foreach(_.unpersist(false))
    merges.map { case (g, b) => g -> b.toSeq }.toMap
  }

  /** Tokenize each word type to characters and apply `merges` in
    * rank order (the same greedy fold training used). Returns
    * (word, n_toks) — the per-type BPE token count; joining it back
    * to occurrences is the caller's (cheap, type-keyed) join.
    */
  def encode(wordTypes: DataFrame, merges: Seq[(String, String)]): DataFrame =
    encodeTokens(wordTypes, merges)
      .select(col("word"), size(col("toks")).cast("long").as("n_toks"))

  /** Like [[encode]] but keeps the token ARRAYS — all input columns
    * plus `toks` — for callers that inspect the encoded pieces
    * (vocabulary usage reports) rather than just counting them.
    * Preserving the caller's columns means a (word, cnt) type table
    * encodes in place with NO join back.
    *
    * The merge table enters as DATA (one array-of-structs literal),
    * not as expression structure: a per-merge `withColumn(mergeFold)`
    * chain nests each rank's aggregate inside the next and the
    * expression tree grows multiplicatively with rank; one outer
    * aggregate over the merge array keeps the expression O(1)-sized
    * at ANY vocabulary size — the property a 32k-merge production
    * tokenizer needs.
    *
    * CALLER TRAP (measured, E16): `explode(toks)` downstream lets
    * InferFiltersFromGenerate add `size(toks)>0 AND isnotnull(toks)`,
    * and because toks is a deterministic expression of the grouping
    * key, PushDownPredicates pushes that predicate BELOW the word-type
    * aggregate — re-evaluating this whole fold per corpus OCCURRENCE
    * (13.7 s of a 14 s query at sf0.1). Explode with `explode_outer`
    * (no filter is inferred for outer generates; toks is never empty
    * for non-empty words) or keep the consumer non-generating.
    */
  def encodeTokens(wordTypes: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val kept = wordTypes.columns.toSeq
    val chars =
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    if (merges.isEmpty)
      return wordTypes.withColumn("toks", chars)
        .select((kept :+ "toks").map(col): _*)
    val mergesArr = array(merges.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b")) }: _*)
    wordTypes
      .withColumn("__merges", mergesArr)
      .withColumn("toks", expr(
        """aggregate(__merges,
          |  transform(sequence(1, length(word)), i -> substring(word, i, 1)),
          |  (ts, m) -> aggregate(ts, cast(array() as array<string>),
          |    (acc, x) -> CASE
          |      WHEN size(acc) > 0 AND element_at(acc, size(acc)) = m.a AND x = m.b
          |      THEN concat(slice(acc, 1, size(acc) - 1), array(concat(m.a, m.b)))
          |      ELSE concat(acc, array(x)) END))""".stripMargin))
      .select((kept :+ "toks").map(col): _*)
  }

  /** Session-level tokenizer-artifact cache: a merge table is trained
    * ONCE per (corpus key, rounds) and reused by every later
    * encode-only query — the real tokenizer deployment shape (a
    * vocabulary is a build artifact; production encodes with it, it
    * does not retrain per query). The cached value is the O(rounds)
    * driver-side merge list, exactly what a tokenizer file holds.
    */
  object Artifacts {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
    private val trainings = new java.util.concurrent.atomic.AtomicLong(0L)

    /** How many trainings have actually run (spec hook: an encode-only
      * query hitting a warm cache must not move this).
      */
    def trainCount: Long = trainings.get()

    def clear(): Unit = cache.clear()

    /** The merge table for `key`, training over `wordCounts` only on
      * the first request.
      */
    def mergesFor(wordCounts: => DataFrame, key: String,
        nMerges: Int): Seq[(String, String)] =
      cache.computeIfAbsent(s"$key#$nMerges", _ => {
        trainings.incrementAndGet()
        train(wordCounts, nMerges).orderBy(col("merge_rank"))
          .select(col("pa"), col("pb"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      })
  }

  private def mergesToDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("merge_rank", LongType, nullable = false),
      StructField("pa", StringType, nullable = false),
      StructField("pb", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("weight", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        merges.map(m => Row(m.rank, m.pa, m.pb, m.pa + m.pb, m.weight)).toSeq: _*),
      schema)
  }
}

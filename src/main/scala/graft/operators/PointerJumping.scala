package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pointer jumping (Wyllie '79) over a parent forest: resolve every
  * node's root and depth in ⌈log2 depth⌉ rounds of self-joins instead
  * of one shuffle per level. Each round squares the hop — f' = f∘f,
  * d' = d + d∘f — so a million-deep chain needs 20 rounds and a
  * balanced million-node tree 5; the round count depends on DEPTH, not
  * node count, which is what makes hierarchies tractable at 100 TB
  * (org charts, category trees, thread ancestries, symlink chains).
  *
  * Contract: `edges` is (node: long, parent: long); a ROOT points to
  * itself. Every referenced parent must exist as a node. Output:
  * (node, root, depth). Rounds checkpoint eagerly (the jumped frame
  * references itself twice per round — untruncated, the plan doubles).
  */
object PointerJumping {

  def resolve(spark: SparkSession, edges: DataFrame): DataFrame = {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")
    var f = edges.select(col("node"),
        col("parent").as("anc"),
        when(col("parent") === col("node"), 0L).otherwise(1L).as("d"))
      .checkpoint(eager = true)
    var pending = f.filter(col("anc") =!= col("node"))
      .join(f.select(col("node").as("anc2"), (col("anc") =!= col("node")).as("more")),
        col("anc") === col("anc2"))
      .filter(col("more")).count()
    while (pending > 0) {
      val g = f.select(col("node").as("g_node"), col("anc").as("g_anc"),
        col("d").as("g_d"))
      f = f.join(g, col("anc") === col("g_node"))
        .select(col("node"), col("g_anc").as("anc"),
          (col("d") + col("g_d")).as("d"))
        .checkpoint(eager = true)
      pending = f.filter(col("anc") =!= col("node"))
        .join(f.select(col("node").as("anc2"), (col("anc") =!= col("node")).as("more")),
          col("anc") === col("anc2"))
        .filter(col("more")).count()
    }
    f.select(col("node"), col("anc").as("root"), col("d").as("depth"))
  }
}

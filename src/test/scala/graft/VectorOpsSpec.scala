package graft

import org.apache.spark.sql.functions._

/** Native DotProductExpr: value parity with the interpreted HOF fold
  * and sane null/edge behavior, plus codegen actually engaging.
  */
class VectorOpsSpec extends SparkSpec {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("native dot == HOF fold bit-for-bit on real embeddings") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      VectorOps.dot(col("v"), col("v")).as("native"),
      hofDot(col("v"), col("v")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0L)
    assert(both.count() > 0)
  }

  test("null input yields null, empty arrays yield 0.0") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("expression participates in whole-stage codegen") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorOps.dot(col("v"), col("v")).as("d"))
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan.take(500))
  }

  test("type mismatch is rejected at analysis") {
    val df = Seq((1, 2)).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }
}

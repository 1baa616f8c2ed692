package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._

/** The native scalar expression tier must actually run inside
  * generated code: none may be a CodegenFallback, their generated
  * code must compile under CODEGEN_ONLY (no silent interpreted
  * fallback), and codegen results must equal interpreted results.
  * A fallback here would quietly drop a hot-path expression out of
  * whole-stage codegen — the failure mode this spec exists to catch.
  */
class CodegenOnlySpec extends SparkSpec {
  import spark.implicits._

  private def allNative = {
    import graft.functions._
    val text = GraftBridge.expression(col("t"))
    val vec = GraftBridge.expression(col("v"))
    Seq(
      DotProductExpr(vec, vec),
      PolyHashExpr(text),
      MinGramHashExpr(text, 8),
      GramCodeArrayExpr(text, 3),
      SortedIntersectCountExpr(
        GramCodeArrayExpr(text, 3), GramCodeArrayExpr(text, 3)),
      WinnowFingerprintExpr(text, 8, 4),
      BloomContainsExpr(GraftBridge.expression(col("bf")), text))
  }

  test("no native scalar expression is a CodegenFallback") {
    allNative.foreach { e =>
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.prettyName} (${e.getClass.getSimpleName}) is a CodegenFallback")
    }
  }

  test("CODEGEN_ONLY evaluation compiles and equals interpreted evaluation") {
    import graft.functions.BloomFunctions.bloom
    val bf = Seq("alpha", "the quick brown fox", "zz")
      .toDF("s").agg(bloom(col("s"), 4096, 5)).head().getAs[Array[Byte]](0)
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", Seq(1.0, 2.0, 3.0)),
      ("alpha", Seq(0.5, -1.5, 2.25)),
      ("ab", Seq(0.0, 0.0, 0.0)))
      .toDF("t", "v")
      .withColumn("bf", lit(bf))
    val cols = allNative.map(GraftBridge.column)
    def evalWith(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(cols: _*).collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val generated = evalWith("CODEGEN_ONLY")
    val interpreted = evalWith("NO_CODEGEN")
    assert(generated == interpreted,
      "generated and interpreted results must be identical")
    assert(generated.nonEmpty)
  }
}

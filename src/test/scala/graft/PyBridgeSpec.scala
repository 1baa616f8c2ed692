package graft

import graft.ecs.PyBridge

import scala.jdk.CollectionConverters._

/** The py4j facade, exercised exactly as the Python client calls it —
  * java lists/maps, JSON schemas, boxed numbers (the shapes py4j
  * delivers). Mirrors python/example_toy.py (= the reference's
  * tests/test_toy.py scenario) so `sbt test` covers the bridge without
  * a Python interpreter.
  */
class PyBridgeSpec extends SparkSpec {

  private val posJson =
    """{"type":"struct","fields":[
      |{"name":"x","type":"double","nullable":false,"metadata":{}},
      |{"name":"y","type":"double","nullable":false,"metadata":{}}]}""".stripMargin
  private val velJson =
    """{"type":"struct","fields":[
      |{"name":"vx","type":"double","nullable":false,"metadata":{}},
      |{"name":"vy","type":"double","nullable":false,"metadata":{}}]}""".stripMargin

  private def jrow(vs: Any*): java.util.List[Object] =
    vs.map(_.asInstanceOf[Object]).asJava

  test("toy simulation through the py4j calling convention") {
    val pos = PyBridge.meta("Position", posJson)
    val vel = PyBridge.meta("Velocity", velJson)
    val world = PyBridge.makeWorld(spark, "toy_pybridge", "run_0", 4)
    val metas = Seq(pos, vel).asJava

    PyBridge.addProcessor(world, PyBridge.sqlProcessor(
      "Movement", metas, 1,
      Map(
        "position__x" -> "position__x + velocity__vx * {dt}",
        "position__y" -> "position__y + velocity__vy * {dt}").asJava))

    // py4j sends Python ints as Integer — the bridge must coerce to the
    // schema's double, so spawn with mixed Integer/Double boxes
    val e1 = PyBridge.spawn(world, metas,
      Seq(jrow(Int.box(0), Double.box(0.0)), jrow(1.0, 1.0)).asJava)
    PyBridge.spawn(world, metas,
      Seq(jrow(10.0, 5.0), jrow(2.0, -1.0)).asJava)
    PyBridge.spawn(world, metas,
      Seq(jrow(-5.0, -10.0), jrow(-0.5, 0.5)).asJava)

    (1 to 10).foreach(_ => world.step(0.1))

    val hist = PyBridge.history(world, Seq(pos).asJava)
    val totalHist = hist.values().asScala.map(_.count()).sum
    assert(totalHist == 33L) // 3 entities x (spawn frame + 10 steps)

    val live = PyBridge.query(world, metas)
    val rows = live.values().asScala.flatMap(_.collect()).map { r =>
      r.getAs[Long]("entity_id") ->
        (r.getAs[Double]("position__x"), r.getAs[Double]("position__y"))
    }.toMap
    assert(rows.size == 3)
    assert(math.abs(rows(e1)._1 - 1.0) < 1e-9)
    assert(math.abs(rows(e1)._2 - 1.0) < 1e-9)
  }

  test("query passthrough runs any SparkEntry operator by name") {
    val names = PyBridge.queryNames()
    assert(names.size() == SparkEntry.queries.size)
    val df = PyBridge.runQuery(spark, "q1_agg", sfDir)
    assert(df.count() > 0)
    val ex = intercept[IllegalArgumentException] {
      PyBridge.runQuery(spark, "no_such_query", sfDir)
    }
    assert(ex.getMessage.contains("no_such_query"))
  }

  test("spawn validates field arity against the component schema") {
    val pos = PyBridge.meta("Position", posJson)
    val world = PyBridge.makeWorld(spark, "toy_pybridge_arity", "run_0", 4)
    val ex = intercept[IllegalArgumentException] {
      PyBridge.spawn(world, Seq(pos).asJava, Seq(jrow(1.0)).asJava)
    }
    assert(ex.getMessage.contains("Position"))
  }

  test("array fields coerce element-wise (float embedding from a python list)") {
    val embJson =
      """{"type":"struct","fields":[
        |{"name":"v","type":{"type":"array","elementType":"float",
        |"containsNull":false},"nullable":false,"metadata":{}}]}""".stripMargin
    val emb = PyBridge.meta("Emb", embJson)
    val world = PyBridge.makeWorld(spark, "toy_pybridge_arr", "run_0", 4)
    // python floats arrive as Double inside an ArrayList; schema wants float
    PyBridge.spawn(world, Seq(emb).asJava,
      Seq(jrow(Seq(Double.box(0.5), Int.box(2)).asJava)).asJava)
    val live = PyBridge.query(world, Seq(emb).asJava)
    val vs = live.values().asScala.flatMap(_.collect())
      .map(r => r.getSeq[Float](r.fieldIndex("emb__v"))).head
    assert(vs.toList == List(0.5f, 2.0f))
  }
}

package graft.ecs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** py4j-facing facade for the ECS tier — the Python on-ramp.
  *
  * The reference is consumed from Python (tests/test_toy.py:6-22:
  * `make_world`, `Component`, `@processor`, `world.spawn/step/
  * get_history`). PySpark drivers reach the same surface through this
  * object over the JVM gateway (`spark._jvm.graft.ecs.PyBridge`): every
  * method takes only py4j-friendly shapes — java lists/maps, JSON
  * schema strings, boxed numbers — and no Scala default args, varargs,
  * or case-class instances. The heavy lifting stays in [[World]] /
  * [[ArchetypeStore]]; this file only adapts calling conventions.
  *
  * See python/graft/__init__.py for the client, python/example_toy.py
  * for the test_toy-shaped end-to-end example.
  */
object PyBridge {

  def makeWorld(spark: SparkSession, simulation: String, run: String,
      optimizeInterval: Int): World =
    World.make(spark, simulation, run, optimizeInterval)

  /** ComponentMeta from a Spark StructType JSON string (the format
    * `StructType.json` / pyspark's `schema.json()` emit).
    */
  def meta(name: String, schemaJson: String): ComponentMeta =
    ComponentMeta(name, DataType.fromJson(schemaJson).asInstanceOf[StructType])

  /** Coerce a py4j-delivered value to the schema's field type: Python
    * numbers arrive as whatever boxed width py4j picked (int/long/
    * double), not necessarily the component schema's declared width.
    */
  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (n: java.lang.Number, DoubleType)  => n.doubleValue()
    case (n: java.lang.Number, FloatType)   => n.floatValue()
    case (n: java.lang.Number, LongType)    => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(coerce(_, et))
    case (other, _) => other
  }

  /** Spawn one entity: `values.get(i)` holds `metas.get(i)`'s field
    * values in declared order. Returns the new entity id.
    */
  def spawn(world: World, metas: java.util.List[ComponentMeta],
      values: java.util.List[java.util.List[Object]]): Long = {
    val ms = metas.asScala.toSeq
    val vs = ms.zip(values.asScala.toSeq).map { case (m, row) =>
      m.schema.fields.toSeq.zip(row.asScala.toSeq).map { case (f, v) =>
        coerce(v, f.dataType)
      }
    }
    world.spawnValues(ms, vs)
  }

  /** A processor whose update rule is a map of column -> SQL expression
    * (the literal `{dt}` substitutes the step's dt) — how Python defines
    * the reference's `@processor`-decorated update logic without a
    * per-row callback into the Python interpreter. The expressions run
    * as codegen'd Catalyst plans exactly like a Scala processor's.
    */
  def sqlProcessor(name: String, metas: java.util.List[ComponentMeta],
      priorityLevel: Int,
      updates: java.util.Map[String, String]): Processor = {
    val ms = metas.asScala.toSeq
    val ups = updates.asScala.toSeq.sortBy(_._1)
    new Processor {
      override def priority: Int = priorityLevel
      override def components: Seq[ComponentMeta] = ms
      override def process(df: DataFrame, dt: Double): DataFrame =
        ups.foldLeft(df) { case (d, (c, e)) =>
          d.withColumn(c, expr(e.replace("{dt}", dt.toString)))
        }
      override def toString: String = s"SqlProcessor($name)"
    }
  }

  def addProcessor(world: World, p: Processor): Unit = world.addProcessor(p)

  /** Live state of every archetype carrying all `metas`, keyed by
    * archetype hash (reference: world.query).
    */
  def query(world: World, metas: java.util.List[ComponentMeta])
      : java.util.Map[String, DataFrame] =
    world.query(metas.asScala.toSeq).asJava

  /** Full step history (reference: world.get_history). */
  def history(world: World, metas: java.util.List[ComponentMeta])
      : java.util.Map[String, DataFrame] =
    world.getHistory(metas.asScala.toSeq).asJava

  // ------------------------------------------------------------------
  // Query-surface passthrough: every SparkEntry operator is callable
  // from Python by name against any parquet store directory.
  // ------------------------------------------------------------------

  def queryNames(): java.util.List[String] =
    graft.SparkEntry.queries.keys.toSeq.sorted.asJava

  def runQuery(spark: SparkSession, name: String, sfDir: String): DataFrame =
    graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; see queryNames()"))(spark, sfDir)
}

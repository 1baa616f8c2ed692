package graft.ecs

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._

import scala.reflect.runtime.universe.TypeTag

/** Marker for component case classes (flat scalar/array fields).
  *
  * Re-expression of the reference's `Component(LanceModel)` typed schema
  * (reference: archetype/core/interfaces.py:6, tests/test_toy.py:6-13):
  * a component is a named bag of typed fields; an entity's set of
  * component types is its archetype.
  */
trait Component extends Product

/** Schema-level descriptor of a component type.
  *
  * The reference prefixes every component field with
  * `<componentname>__` inside the archetype table
  * (archetype/core/store.py:73-93). We keep the same column-naming
  * convention so processors address columns identically.
  */
final case class ComponentMeta(name: String, schema: StructType) {
  def prefix: String = name.toLowerCase + "__"
  def prefixedFields: Seq[StructField] =
    schema.fields.toSeq.map(f => f.copy(name = prefix + f.name))
}

object ComponentMeta {

  /** Derive meta from a case class type (compile-time, Encoder-based). */
  def of[C <: Component: TypeTag]: ComponentMeta = {
    val enc = Encoders.product[C]
    val name = implicitly[TypeTag[C]].tpe.typeSymbol.name.toString
    ComponentMeta(name, enc.schema)
  }

  /** Derive meta from a live instance (runtime, for `world.spawn(...)`). */
  def fromInstance(c: Component): ComponentMeta = {
    val name = c.getClass.getSimpleName.stripSuffix("$")
    val fields = (0 until c.productArity).map { i =>
      val fieldName = c.productElementName(i)
      val dt = c.productElement(i) match {
        case _: java.lang.Double  => DoubleType
        case _: java.lang.Float   => FloatType
        case _: java.lang.Long    => LongType
        case _: java.lang.Integer => IntegerType
        case _: java.lang.Boolean => BooleanType
        case _: String            => StringType
        case _: Array[Byte]       => BinaryType
        case _: Array[Float]      => ArrayType(FloatType, containsNull = false)
        case _: Array[Double]     => ArrayType(DoubleType, containsNull = false)
        case v =>
          throw new IllegalArgumentException(
            s"Unsupported component field type for $name.$fieldName: ${v.getClass}")
      }
      StructField(fieldName, dt, nullable = false)
    }
    ComponentMeta(name, StructType(fields))
  }
}

/** Archetype identity: hash of the sorted component-type names
  * (reference: archetype/core/store.py:57-71). We use truncated SHA-256
  * instead of blake2b; only determinism and collision resistance matter.
  */
object Archetype {
  val BaseFields: Seq[StructField] = Seq(
    StructField("simulation", StringType, nullable = false),
    StructField("run", StringType, nullable = false),
    StructField("entity_id", LongType, nullable = false),
    StructField("step", LongType, nullable = false),
    StructField("is_active", BooleanType, nullable = false))

  def signature(metas: Seq[ComponentMeta]): Seq[ComponentMeta] =
    metas.sortBy(_.name)

  def hashOf(metas: Seq[ComponentMeta]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    signature(metas).foreach(m => md.update(m.name.getBytes("UTF-8")))
    val hex = md.digest().take(10).map(b => f"$b%02x").mkString
    s"archetype_$hex"
  }

  /** Base columns + prefixed component columns, in signature order. */
  def schemaOf(metas: Seq[ComponentMeta]): StructType =
    StructType(BaseFields ++ signature(metas).flatMap(_.prefixedFields))
}

package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.types._

/** Arc-style external schema documents: a JSON array of per-column docs
  * (`name`, `type`, `nullable`, `precision`/`scale`, `formatters`,
  * `timezoneId`, free-form `metadata`) compiled to a Spark `StructType`
  * with per-field `Metadata` (ref: getKnownDatasetMetadataJson,
  * TestUtils.scala:174-349 — the reference attaches exactly these keys).
  *
  * The `time` type has no Spark equivalent; per the reference it stays a
  * formatted string with its formatter recorded in metadata (SURVEY §1.2).
  */
object SchemaDoc {

  final case class ColumnDoc(
      name: String,
      typeName: String,
      nullable: Boolean,
      precision: Option[Int],
      scale: Option[Int],
      formatters: Seq[String],
      trim: Boolean,
      nullableValues: Seq[String],
      metadata: Map[String, Any])

  def dataTypeOf(c: ColumnDoc): DataType = c.typeName match {
    case "boolean"        => BooleanType
    case "date"           => DateType
    case "decimal"        => DecimalType(c.precision.getOrElse(38), c.scale.getOrElse(18))
    case "double"         => DoubleType
    case "integer"        => IntegerType
    case "long"           => LongType
    case "string" | "time" => StringType // time = formatted string (SURVEY §1.2)
    case "timestamp"      => TimestampType
    case "binary"         => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported column type '$other'")
  }

  /** Parse a JSON schema document into column docs (fail-fast: schema docs
    * are build-time artifacts, not user pipeline config).
    */
  def parse(json: String): Seq[ColumnDoc] = {
    val JArray(cols) = JsonMethods.parse(json): @unchecked
    cols.map { c =>
      def str(k: String): Option[String] =
        (c \ k) match { case JString(s) => Some(s); case _ => None }
      def int(k: String): Option[Int] =
        (c \ k) match { case JInt(i) => Some(i.toInt); case _ => None }
      ColumnDoc(
        name = str("name").getOrElse(
          throw new IllegalArgumentException("column doc missing 'name'")),
        typeName = str("type").getOrElse("string"),
        nullable = (c \ "nullable") match { case JBool(b) => b; case _ => true },
        precision = int("precision"),
        scale = int("scale"),
        formatters = (c \ "formatters") match {
          case JArray(xs) => xs.collect { case JString(s) => s }
          case _          => Nil
        },
        trim = (c \ "trim") match { case JBool(b) => b; case _ => false },
        nullableValues = (c \ "nullableValues") match {
          case JArray(xs) => xs.collect { case JString(s) => s }
          case _          => Nil
        },
        metadata = (c \ "metadata") match {
          case JObject(fs) => fs.collect {
            case (k, JString(v)) => k -> v
            case (k, JBool(v))   => k -> v
            case (k, JInt(v))    => k -> v.toLong
            case (k, JDouble(v)) => k -> v
          }.toMap
          case _ => Map.empty[String, Any]
        })
    }
  }

  /** Compile column docs to a StructType with metadata attached. */
  def toStructType(cols: Seq[ColumnDoc]): StructType =
    StructType(cols.map { c =>
      val mb = new MetadataBuilder()
      if (c.formatters.nonEmpty) mb.putStringArray("formatters", c.formatters.toArray)
      c.metadata.foreach {
        case (k, v: String)  => mb.putString(k, v)
        case (k, v: Boolean) => mb.putBoolean(k, v)
        case (k, v: Long)    => mb.putLong(k, v)
        case (k, v: Double)  => mb.putDouble(k, v)
        case _               => ()
      }
      StructField(c.name, dataTypeOf(c), c.nullable, mb.build())
    })
}

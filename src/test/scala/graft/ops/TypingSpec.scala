package graft.ops

import graft.SparkSpec
import graft.schema.SchemaDoc
import graft.pipeline._
import org.apache.spark.sql.types._

class TypingSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson = """
    [{"name":"id","type":"long","nullable":false},
     {"name":"qty","type":"integer"},
     {"name":"price","type":"decimal","precision":10,"scale":3},
     {"name":"ratio","type":"double"},
     {"name":"flag","type":"boolean"},
     {"name":"born","type":"date","formatters":["MM/dd/yyyy"]},
     {"name":"seen","type":"timestamp","formatters":["yyyy-MM-dd HH:mm:ss"]},
     {"name":"tod","type":"time","formatters":["HH:mm:ss"],
      "metadata":{"private":true,"securityLevel":5}}]"""

  test("schema doc parses to StructType with metadata + formatters") {
    val cols = SchemaDoc.parse(schemaJson)
    val st = SchemaDoc.toStructType(cols)
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("price").dataType == DecimalType(10, 3))
    assert(st("tod").dataType == StringType, "time stays a formatted string")
    assert(st("tod").metadata.getBoolean("private"))
    assert(st("tod").metadata.getLong("securityLevel") == 5L)
    assert(st("born").metadata.getStringArray("formatters").head == "MM/dd/yyyy")
  }

  test("typing transform coerces an all-string frame to the typed schema") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    Seq(("17", "3", "54.321", "42.42", "true", "12/20/2017", "2017-12-20 21:46:54", "12:34:56"))
      .toDF("id", "qty", "price", "ratio", "flag", "born", "seen", "tod")
      .createOrReplaceTempView("typing_src")
    val out = TypingTransformStage("t", "typing_src", "typing_out", schemaJson)
      .run().get
    val r = out.head()
    assert(out.schema("qty").dataType == IntegerType)
    assert(r.getAs[Long]("id") == 17L)
    assert(r.getAs[java.math.BigDecimal]("price").doubleValue() == 54.321)
    assert(r.getAs[Boolean]("flag"))
    assert(r.getAs[java.sql.Date]("born").toString == "2017-12-20")
    assert(r.getAs[java.sql.Timestamp]("seen").toString == "2017-12-20 21:46:54.0")
    assert(r.getAs[String]("tod") == "12:34:56")
  }

  test("trim and nullableValues clean inputs before the cast") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    Seq(("  42 ", "null"), ("7", "  x  "), ("", "y"))
      .toDF("n", "s").createOrReplaceTempView("typing_clean_src")
    val out = TypingTransformStage("tc", "typing_clean_src", "typing_clean_out",
      """[{"name":"n","type":"integer","trim":true,"nullableValues":[""]},
         {"name":"s","type":"string","trim":true,"nullableValues":["null"]}]""")
      .run().get.collect()
    val byS = out.map(r => (r.isNullAt(0), Option(r.getString(1)))).toSet
    assert(byS == Set(
      (false, None),        // "  42 " -> 42, "null" -> null
      (false, Some("x")),   // trimmed string
      (true, Some("y"))))   // "" -> null int
    val n42 = out.find(!_.isNullAt(0)).get
    assert(Set(42, 7).contains(n42.getInt(0)))
  }

  test("unsupported type in a schema doc fails fast") {
    intercept[IllegalArgumentException] {
      SchemaDoc.toStructType(SchemaDoc.parse("""[{"name":"x","type":"uuid5"}]"""))
    }
  }
}

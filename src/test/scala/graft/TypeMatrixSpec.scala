package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import graft.connect.{DelimitedConnector, ParquetConnector}
import graft.ops._
import graft.pipeline._
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._

/** The reference's supported-type matrix (FIXTURES §2 / SURVEY §1.2),
  * round-tripped through Load -> Extract: boolean, date, decimal(10,3),
  * double, integer, long, string (with embedded delimiter), time-as-string,
  * timestamp, null. Plus the reference IT's core scenario: an all-string
  * CSV coerced into typed columns (CSV source -> TypingTransform), mirroring
  * CassandraLoadSuite.scala:63 + create_table.cql:1.
  */
class TypeMatrixSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("booleanDatum", BooleanType, nullable = false),
    StructField("dateDatum", DateType, nullable = false),
    StructField("decimalDatum", DecimalType(10, 3), nullable = false),
    StructField("doubleDatum", DoubleType, nullable = false),
    StructField("integerDatum", IntegerType, nullable = false),
    StructField("longDatum", LongType, nullable = false),
    StructField("stringDatum", StringType, nullable = false),
    StructField("timeDatum", StringType, nullable = false),
    StructField("timestampDatum", TimestampType, nullable = false),
    StructField("nullDatum", StringType, nullable = true)))

  private def knownData = spark.createDataFrame(
    java.util.List.of(
      Row(true, Date.valueOf("2016-12-18"), new java.math.BigDecimal("54.321"),
        42.4242, 17, 1520828868L, "test,breakdelimiter", "12:34:56",
        Timestamp.valueOf("2017-12-20 21:46:54"), null),
      Row(false, Date.valueOf("2016-12-19"), new java.math.BigDecimal("12.345"),
        3.14159, 34, 1520828123L, "breakdelimiter,test", "23:45:16",
        Timestamp.valueOf("2017-12-29 17:21:49"), null)),
    schema)

  test("full type matrix survives a Load -> Extract round trip") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = Files.createTempDirectory("graft_types").toString
    val conn = new ParquetConnector(tmp)
    knownData.createOrReplaceTempView("tm_known")
    LoadStage("sink", conn, "tm_known", "known", SaveMode.Overwrite,
      options = Map("confirm.truncate" -> "true")).run()
    val back = ExtractStage("back", conn, "known", "tm_back").run().get
    assert(back.schema("decimalDatum").dataType == DecimalType(10, 3))
    assert(back.schema("timestampDatum").dataType == TimestampType)
    assert(datasetEquality(knownData, back))
  }

  test("reference IT shape: all-string CSV -> typed columns via TypingTransform") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/breeds.csv"),
      """breed,height_low_inches,height_high_inches,weight_low_lbs,weight_high_lbs
        |Akita,26,28,80,120
        |Anatolian Sheepdog,27,29,100,150
        |""".stripMargin)
    val conf = """{"stages": [
      {"type": "Extract", "name": "csv", "connection": "csv",
       "table": "breeds", "outputView": "tm_csv_raw"},
      {"type": "TypingTransform", "name": "typed",
       "inputView": "tm_csv_raw", "outputView": "tm_csv_typed",
       "schema": "[{\"name\":\"breed\",\"type\":\"string\",\"nullable\":false},{\"name\":\"height_low_inches\",\"type\":\"integer\"},{\"name\":\"height_high_inches\",\"type\":\"integer\"},{\"name\":\"weight_low_lbs\",\"type\":\"integer\"},{\"name\":\"weight_high_lbs\",\"type\":\"integer\"}]"}
    ]}"""
    val Right(p) = Parser.parse(conf, Map(
      "default" -> new ParquetConnector(sf001),
      "csv" -> new DelimitedConnector(dir))): @unchecked
    val out = Runner.run(p).get
    assert(out.schema("height_low_inches").dataType == IntegerType)
    assert(out.count() == 2)
    assert(out.where("breed = 'Akita'").head().getAs[Int]("weight_high_lbs") == 120)
    // CSV reads as all-string before typing (the reference contract)
    assert(spark.table("tm_csv_raw").schema.fields.forall(_.dataType == StringType))
  }
}

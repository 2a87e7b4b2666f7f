package graft.connect

import graft.SparkSpec
import graft.pipeline.PipelineContext
import org.apache.spark.sql.SaveMode

class JsonConnectorSpec extends SparkSpec {
  import spark.implicits._

  test("json keyspace round-trips rows; numbers come back as bigint") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_json_spec").toString
    val js = new JsonConnector(tmp)
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "s", "v")
    js.write(df, "t", SaveMode.ErrorIfExists, Map.empty)
    val back = js.read("t", Map.empty)
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.orderBy("id").select("s").as[String].collect().toSeq
      == Seq("a", "b"))
  }

  test("overwrite requires the destructive-write latch") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_json_spec2").toString
    val js = new JsonConnector(tmp)
    val df = Seq((1L, "a")).toDF("id", "s")
    js.write(df, "t", SaveMode.ErrorIfExists, Map.empty)
    intercept[IllegalArgumentException] {
      js.write(df, "t", SaveMode.Overwrite, Map.empty)
    }
    js.write(df, "t", SaveMode.Overwrite, Map("confirm.truncate" -> "true"))
    assert(js.read("t", Map.empty).count() == 1)
  }
}

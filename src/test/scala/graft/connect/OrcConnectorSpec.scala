package graft.connect

import graft.SparkSpec
import graft.pipeline.PipelineContext
import org.apache.spark.sql.SaveMode

class OrcConnectorSpec extends SparkSpec {
  import spark.implicits._

  test("orc keyspace round-trips rows with types preserved exactly") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    val orc = new OrcConnector(tmp)
    val df = Seq((1, "a", 2.5f, 3L), (2, "b", 4.5f, 5L)).toDF("i", "s", "f", "l")
    orc.write(df, "t", SaveMode.ErrorIfExists, Map.empty)
    val back = orc.read("t", Map.empty)
    // int stays int, float stays float (nullability relaxes on file read)
    assert(back.schema.map(f => f.name -> f.dataType)
      == df.schema.map(f => f.name -> f.dataType))
    assert(back.orderBy("i").collect().toSeq == df.orderBy("i").collect().toSeq)
  }

  test("overwrite requires the destructive-write latch") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_spec2").toString
    val orc = new OrcConnector(tmp)
    val df = Seq((1, "a")).toDF("i", "s")
    orc.write(df, "t", SaveMode.ErrorIfExists, Map.empty)
    intercept[IllegalArgumentException] {
      orc.write(df, "t", SaveMode.Overwrite, Map.empty)
    }
    orc.write(df, "t", SaveMode.Overwrite, Map("confirm.truncate" -> "true"))
    assert(orc.read("t", Map.empty).count() == 1)
  }
}

package graft.pipeline

import java.nio.file.Files
import graft.SparkSpec
import graft.connect.ParquetConnector
import graft.ops._
import org.apache.spark.sql.SaveMode

/** End-to-end pipeline behavior mirroring the reference IT suite:
  * config-string -> parse -> run -> assert round-trip
  * (ref: CassandraLoadSuite.scala:66-139), plus the negative Execute path
  * asserting error propagation through DetailException
  * (ref: CassandraExecuteSuite.scala:72-97).
  */
class PipelineSpec extends SparkSpec {

  test("e2e JSON pipeline round-trip: extract -> transform -> load -> extract") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = Files.createTempDirectory("graft_pspec").toString
    val conf = s"""{"stages": [
      {"type": "Extract", "name": "src", "table": "customer",
       "outputView": "ps_customer"},
      {"type": "SqlTransform", "name": "xform",
       "sql": "SELECT c_custkey, c_name FROM ps_customer WHERE c_custkey <= $${maxkey}",
       "sqlParams": {"maxkey": "50"}, "outputView": "ps_small"},
      {"type": "Load", "name": "sink", "connection": "tmp",
       "inputView": "ps_small", "table": "small",
       "saveMode": "Overwrite", "params": {"confirm.truncate": "true"}},
      {"type": "Extract", "name": "back", "connection": "tmp",
       "table": "small", "outputView": "ps_back"}
    ]}"""
    val Right(pipeline) = Parser.parse(conf, Map(
      "default" -> new ParquetConnector(sf001),
      "tmp" -> new ParquetConnector(tmp))): @unchecked
    val out = Runner.run(pipeline).get
    val expected = spark.read.parquet(s"$sf001/customer.parquet")
      .where("c_custkey <= 50").select("c_custkey", "c_name")
    assert(out.count() == expected.count())
    assert(datasetEquality(expected, out))
  }

  test("environments filter skips non-matching stages") {
    implicit val ctx: PipelineContext = PipelineContext(spark, environment = "test")
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    def probe(n: String) = new Stage {
      val name = n
      def execute()(implicit ctx: PipelineContext) = { ran += n; None }
    }
    Runner.run(Pipeline(Seq(
      StageDef(probe("always")),
      StageDef(probe("test_only"), Seq("test")),
      StageDef(probe("prod_only"), Seq("production")))))
    assert(ran.toSeq == Seq("always", "test_only"))
  }

  test("negative Execute: engine error propagates with stage detail") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val e = intercept[DetailException] {
      ExecuteStage("bad", new ParquetConnector(sf001),
        sql = "SELCT broken FROM nowhere").run()
    }
    // the engine's own parser message must surface (ref asserts Cassandra's
    // "no viable alternative" verbatim; Spark's equivalent is a syntax error)
    assert(e.getMessage.toLowerCase.contains("syntax"))
    assert(e.detail.contains("sql"), "failing statement recorded in detail")
  }

  test("immutable views: re-registering a view fails, detail preserved") {
    implicit val ctx: PipelineContext = PipelineContext(spark, immutableViews = true)
    val conn = new ParquetConnector(sf001)
    ExtractStage("one", conn, "region", "imm_region").run()
    val e = intercept[DetailException] {
      ExtractStage("two", conn, "region", "imm_region").run()
    }
    assert(e.detail("outputView") == "imm_region")
  }

  test("overwrite latch: refuses without confirm.truncate, works with it") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = Files.createTempDirectory("graft_latch").toString
    val conn = new ParquetConnector(tmp)
    ExtractStage("src", new ParquetConnector(sf001), "region", "latch_region").run()
    intercept[DetailException] {
      LoadStage("l1", conn, "latch_region", "region", SaveMode.Overwrite).run()
    }
    LoadStage("l2", conn, "latch_region", "region", SaveMode.Overwrite,
      options = Map("confirm.truncate" -> "true")).run()
    assert(ExtractStage("back", conn, "region", "latch_back").run().get.count() == 5)
  }

  test("save modes: Append accumulates, Ignore is a no-op, ErrorIfExists throws") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = Files.createTempDirectory("graft_modes").toString
    val conn = new ParquetConnector(tmp)
    ExtractStage("src", new ParquetConnector(sf001), "region", "sm_region").run()
    LoadStage("a1", conn, "sm_region", "r", SaveMode.Append).run()
    LoadStage("a2", conn, "sm_region", "r", SaveMode.Append).run()
    LoadStage("ig", conn, "sm_region", "r", SaveMode.Ignore).run()
    intercept[DetailException] {
      LoadStage("er", conn, "sm_region", "r", SaveMode.ErrorIfExists).run()
    }
    assert(ExtractStage("back", conn, "r", "sm_back").run().get.count() == 10)
  }

  test("extract metrics land in stage detail") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val st = ExtractStage("m", new ParquetConnector(sf001), "nation",
      "met_nation", persist = true)
    st.run()
    assert(st.detail("records") == 25L)
    assert(st.detail.contains("inputFiles") && st.detail.contains("numPartitions"))
    // build version is stamped into every stage's detail (ref parity:
    // BuildInfo.version, CassandraExtract.scala:15)
    assert(st.detail("version") == graft.BuildInfo.version)
    assert(graft.BuildInfo.version.nonEmpty)
  }
}

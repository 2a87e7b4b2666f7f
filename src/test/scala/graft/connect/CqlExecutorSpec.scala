package graft.connect

import graft.SparkSpec
import graft.pipeline.PipelineContext

/** Recording fake registered via
  * `src/test/resources/META-INF/services/graft.connect.CqlExecutor` —
  * proves [[CassandraFormatConnector.execute]] performs the conf merge
  * and hands the statement to the ServiceLoader-discovered executor
  * (production swaps in the DataStax-driver implementation the same way).
  */
final class RecordingCqlExecutor extends CqlExecutor {
  override def execute(statement: String,
      settings: Map[String, String]): Unit = {
    RecordingCqlExecutor.calls.add((statement, settings))
  }
}

object RecordingCqlExecutor {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, Map[String, String])]()
}

class CqlExecutorSpec extends SparkSpec {

  test("execute merges spark.cassandra.* conf and reaches the SPI executor") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    spark.sparkContext.getConf
      .set("spark.cassandra.connection.host", "cass-1")
    val c = new CassandraFormatConnector("ks")
    RecordingCqlExecutor.calls.clear()
    c.execute("TRUNCATE ks.t",
      Map("spark.cassandra.auth.username" -> "svc",
        "not.a.cassandra.key" -> "dropped"))
    val (stmt, settings) = RecordingCqlExecutor.calls.poll()
    assert(stmt == "TRUNCATE ks.t")
    // stage param present, non-cassandra key filtered out
    assert(settings.get("spark.cassandra.auth.username").contains("svc"))
    assert(settings.keySet.forall(_.startsWith("spark.cassandra.")))
  }
}

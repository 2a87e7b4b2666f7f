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

  test("mergedConf is context conf ++ params: session settings arrive, " +
      "per-stage params OVERRIDE on collision (the reference's " +
      "CassandraExecute.scala:98-102 set-params-onto-conf semantics)") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    // sparkContext.getConf is a CLONE (both here and in the reference),
    // so session-side inclusion is probed with a key the context
    // genuinely carries, not one injected after startup
    object Probe extends Connector {
      def probe(params: Map[String, String]): Map[String, String] =
        mergedConf(params)
      override def read(table: String, options: Map[String, String])(
          implicit ctx: PipelineContext) =
        throw new UnsupportedOperationException
      override def write(df: org.apache.spark.sql.DataFrame,
          table: String, mode: org.apache.spark.sql.SaveMode,
          options: Map[String, String])(
          implicit ctx: PipelineContext): Unit =
        throw new UnsupportedOperationException
      override def execute(statement: String,
          params: Map[String, String])(
          implicit ctx: PipelineContext): Unit =
        throw new UnsupportedOperationException
    }
    val master = spark.sparkContext.getConf.get("spark.master")
    // session-side key arrives with its real value
    assert(Probe.probe(Map.empty).get("spark.master").contains(master))
    // a colliding stage param WINS; non-colliding session keys survive
    val merged = Probe.probe(Map("spark.master" -> "stage-wins",
      "spark.cassandra.auth.username" -> "svc"))
    assert(merged.get("spark.master").contains("stage-wins"))
    assert(merged.get("spark.cassandra.auth.username").contains("svc"))
    assert(merged.get("spark.app.name")
      == spark.sparkContext.getConf.getOption("spark.app.name"))
  }
}

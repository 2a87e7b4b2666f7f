package graft.ops

import java.net.URI
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import graft.connect.Connector
import graft.pipeline._

/** Statement stage: run an out-of-band statement (DDL/DML) against the
  * storage system from the driver, with `${param}` substitution; yields no
  * DataFrame. (ref: execute/CassandraExecute.scala:81-113 — entirely
  * driver-side, no Spark job.)
  */
final case class ExecuteStage(
    name: String,
    connector: Connector,
    sql: String,
    sqlParams: Map[String, String] = Map.empty,
    params: Map[String, String] = Map.empty)
    extends Stage {

  override def execute()(implicit ctx: PipelineContext): Option[DataFrame] = {
    val statement = SqlParams.inject(sql, sqlParams, allowMissing = false)
    detail += "sql" -> statement
    // per-stage connection overrides merged over the session conf inside
    // the connector (ref: CassandraExecute.scala:98-102)
    connector.execute(statement, params)
    None // (ref: CassandraExecute.scala:110)
  }
}

object Statements {

  /** Resolve statement text from a URI at config time
    * (ref: parsedURI |> textContentForURI, CassandraExecute.scala:31-32).
    * Supports `file:` URIs, plain filesystem paths, and `http(s)` with
    * optional request headers (the reference's `authentication` option,
    * e.g. an `Authorization` bearer header).
    */
  def fromUri(uri: String, headers: Map[String, String] = Map.empty): String =
    if (uri.startsWith("http://") || uri.startsWith("https://")) {
      val conn = URI.create(uri).toURL.openConnection()
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } else {
      val path =
        if (uri.startsWith("file:")) Paths.get(URI.create(uri))
        else Paths.get(uri)
      new String(Files.readAllBytes(path), java.nio.charset.StandardCharsets.UTF_8)
    }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.pipeline._

/** Relational transform: run parameterized Spark SQL over the registered
  * temp views, publish the result as a new view.
  *
  * This single stage is how the full relational surface (joins, aggregates,
  * windows, set ops, grouping sets, subqueries, scalar functions) reaches
  * users — the reference delegates exactly the same way: its stages only
  * create/consume views and Arc's SQLTransform runs user SQL between them
  * (ref: SURVEY §2.2; view contract at CassandraExtract.scala:123,
  * CassandraLoad.scala:96). Catalyst owns optimization: pushdown, pruning,
  * join selection, AQE — nothing to hand-schedule here.
  */
final case class SqlTransformStage(
    name: String,
    sql: String,
    outputView: String,
    sqlParams: Map[String, String] = Map.empty,
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil,
    persist: Boolean = false)
    extends Stage {

  override def execute()(implicit ctx: PipelineContext): Option[DataFrame] = {
    val statement = SqlParams.inject(sql, sqlParams, allowMissing = false)
    detail += "sql" -> statement
    detail += "outputView" -> outputView

    val df = Repartition(ctx.spark.sql(statement), numPartitions, partitionBy)
    Views.register(df, outputView)

    detail += "outputColumns" -> df.schema.length
    if (persist && !df.isStreaming) {
      df.persist(StorageLevel.MEMORY_AND_DISK_SER)
      detail += "records" -> df.count()
    }
    Option(df)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.connect.ParquetConnector
import graft.pipeline._
import graft.queries.{ExtensionQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator (reference parity
  * in [[graft.queries.ParityQueries]], LLM-data-pipeline extensions in
  * [[graft.queries.ExtensionQueries]]); `oracleSql` the matching DuckDB
  * statement over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the declarative pipeline end-to-end: extract the star schema,
    * then one SQL transform joining it into revenue per region.
    */
  def entry(spark: SparkSession): DataFrame = {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val dir = "/root/testdata/sf0.001"
    val conn = new ParquetConnector(dir)
    val stages = Seq("region", "nation", "customer", "orders", "lineitem")
      .map(t => StageDef(graft.ops.ExtractStage(s"ex_$t", conn, t, s"entry_$t")))
    val transform = StageDef(graft.ops.SqlTransformStage("revenue", sql = """
      SELECT r.r_name AS region,
        COUNT(DISTINCT o.o_orderkey) AS n_orders,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
          * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM entry_lineitem l
      JOIN entry_orders o ON l.l_orderkey = o.o_orderkey
      JOIN entry_customer c ON o.o_custkey = c.c_custkey
      JOIN entry_nation n ON c.c_nationkey = n.n_nationkey
      JOIN entry_region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name ORDER BY region""",
      outputView = "entry_revenue"))
    Runner.run(Pipeline(stages :+ transform)).get
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.3). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables.
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ ExtensionQueries.oracles
}

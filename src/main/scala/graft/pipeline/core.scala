package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Runtime context threaded through every stage.
  *
  * Mirrors the Arc `ARCContext` surface the reference stages depend on
  * (ref: extract/CassandraExtract.scala:81-94 — `isStreaming`,
  * `immutableViews`; execute-time environment filtering in the parser).
  *
  * @param environment     active environment tag; stages whose
  *                        `environments` list is non-empty and does not
  *                        contain this value are skipped by the runner.
  * @param isStreaming     batch-only stages guard on this (empty extract /
  *                        skipped load), matching the reference semantics.
  * @param immutableViews  when true, view registration uses `createTempView`
  *                        (throws on duplicates) instead of
  *                        `createOrReplaceTempView` — append-only catalog.
  */
final case class PipelineContext(
    spark: SparkSession,
    environment: String = "test",
    isStreaming: Boolean = false,
    immutableViews: Boolean = false)

/** Runtime failure wrapped with the failing stage's structured detail map,
  * so orchestrators can log lineage for the failure.
  * (ref: CassandraExtract.scala:100-104 `DetailException` pattern.)
  */
final class DetailException(
    message: String,
    val detail: Map[String, Any],
    cause: Throwable)
    extends RuntimeException(message, cause)

/** A pipeline stage: executes against the session, optionally yielding a
  * DataFrame. Stages communicate through NAMED TEMP VIEWS, not object
  * references (ref: CassandraExtract.scala:123, CassandraLoad.scala:96).
  */
trait Stage {

  /** User-facing stage name (from config). */
  def name: String

  /** Structured lineage/metrics detail, populated during execute and
    * attached to any thrown error. Insertion-ordered for stable logs.
    */
  val detail: mutable.LinkedHashMap[String, Any] = mutable.LinkedHashMap.empty

  def execute()(implicit ctx: PipelineContext): Option[DataFrame]

  /** Execute with detail-preserving error wrapping. Every run stamps the
    * library version into detail first (ref: BuildInfo.version,
    * CassandraExtract.scala:15) so lineage records which build produced
    * them — including failed runs.
    */
  final def run()(implicit ctx: PipelineContext): Option[DataFrame] =
    try { detail += "version" -> graft.BuildInfo.version; execute() }
    catch {
      case e: DetailException => throw e
      case e: Throwable =>
        detail += "error" -> String.valueOf(e.getMessage)
        throw new DetailException(
          s"stage '$name' failed: ${e.getMessage}", detail.toMap, e)
    }
}

object Views {

  /** Register a DataFrame under a view name, honoring the append-only
    * catalog mode (ref: CassandraExtract.scala:123).
    */
  def register(df: DataFrame, view: String)(implicit ctx: PipelineContext): Unit =
    if (ctx.immutableViews) df.createTempView(view)
    else df.createOrReplaceTempView(view)

  /** Resolve a view by name (ref: CassandraLoad.scala:96). */
  def resolve(view: String)(implicit ctx: PipelineContext): DataFrame =
    ctx.spark.table(view)
}

object Repartition {

  /** The reference's 4-way repartition matrix, used both post-extract and
    * pre-load (ref: CassandraExtract.scala:107-122,
    * CassandraLoad.scala:110-153):
    *   - no hints           → unchanged (inherit source partitioning)
    *   - n only             → round-robin to exactly n partitions
    *   - cols only          → hash-cluster by cols (session default N)
    *   - n + cols           → hash-cluster by cols into n partitions
    *
    * At 100 TB the cols forms are the write-locality lever (align shuffle
    * with the sink's partition keys); the round-robin form is the
    * parallelism/small-files lever.
    */
  def apply(df: DataFrame, numPartitions: Option[Int], partitionBy: Seq[String]): DataFrame =
    (numPartitions, partitionBy) match {
      case (None, Seq())    => df
      case (Some(n), Seq()) => df.repartition(n)
      case (None, cols)     => df.repartition(cols.map(df(_)): _*)
      case (Some(n), cols)  => df.repartition(n, cols.map(df(_)): _*)
    }
}

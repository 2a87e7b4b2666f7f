package graft.pipeline

import org.apache.spark.sql.DataFrame

/** A stage plus its pipeline wiring metadata.
  *
  * `environments` mirrors the reference's conditional stage inclusion
  * (ref: src/it/resources/arc.json:6-9 — stages carry an `environments`
  * array and are skipped unless the active environment matches; empty
  * list = always run).
  */
final case class StageDef(stage: Stage, environments: Seq[String] = Nil) {
  def enabledIn(environment: String): Boolean =
    environments.isEmpty || environments.contains(environment)
}

final case class Pipeline(stages: Seq[StageDef])

/** Sequential, fail-fast pipeline runner (ref: ARC.run usage,
  * CassandraLoadSuite.scala:134 — stages execute in order on the driver;
  * the result is the last stage's non-None DataFrame).
  *
  * Stage orchestration is driver-side only; all data-plane work stays in
  * Spark jobs, so this loop is scale-free — it never touches rows.
  */
object Runner {
  def run(pipeline: Pipeline)(implicit ctx: PipelineContext): Option[DataFrame] =
    pipeline.stages.foldLeft(Option.empty[DataFrame]) { (last, sd) =>
      if (sd.enabledIn(ctx.environment)) sd.stage.run().orElse(last)
      else last
    }
}

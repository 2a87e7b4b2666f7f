package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example assembly: turn a flat event/message log into one row
  * per entity with its interactions in time order — the step that builds
  * conversation transcripts, session traces or user histories for
  * sequence-model training.
  */
object Assemble {

  /** One row per `groupCol` value:
    * (group, total_events, n_turns, convo) where `convo` is the first
    * `maxTurns` payloads in `orderCols` order, space-joined.
    *
    * Shape at scale: a per-group `row_number` window caps every group to
    * `maxTurns` rows BEFORE anything is collected, so the later
    * `collect_list` holds at most `maxTurns` elements regardless of how
    * hot an entity is — without the cap, one power user's full history
    * lands in a single aggregation buffer. The window and the groupBy key
    * on the same column, so Catalyst plans ONE exchange: the group-side
    * aggregation reuses the window's hash partitioning. `total_events`
    * (the uncapped size) rides the same window pass as an
    * unbounded-frame count, costing no extra shuffle.
    *
    * Determinism: `orderCols` must be a within-group unique key (pass a
    * tie-breaker like the event id); the collected structs sort by the
    * capped row number, so the transcript text is reproducible bit-exact.
    */
  def threads(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      payloadCol: String, maxTurns: Int = 16): DataFrame = {
    require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")
    require(orderCols.nonEmpty,
      "at least one ordering column (the stage's determinism contract)")
    val byGroup = Window.partitionBy(groupCol)
    val ordered = byGroup.orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(ordered))
      .withColumn("__tot", count(lit(1)).over(byGroup))
      .where(col("__rn") <= maxTurns)
      .groupBy(col(groupCol))
      .agg(
        max(col("__tot")).as("total_events"),
        count(lit(1)).as("n_turns"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__rn"), col(payloadCol).as("__p")))),
          s => s.getField("__p"))).as("convo"))
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface.
  *
  * The reference treats its storage as batch-only and merely GUARDS
  * streaming mode (empty extract / skipped load — CassandraExtract.scala:
  * 92-94, CassandraLoad.scala:108-109); those guards are ported in
  * [[graft.ops.ExtractStage]]/[[graft.ops.LoadStage]]. This module is the
  * forward path: real event-time aggregation that works identically on a
  * batch DataFrame and a streaming one (`readStream` source), so the same
  * query is testable against the batch oracle and runnable with
  * `writeStream` + watermark in production.
  *
  * Scale notes: windowed groupBy shuffles on (window, key); the watermark
  * bounds state so a 100 TB/day stream holds only the open windows.
  */
object StreamingOps {

  /** Event-time tumbling-window counts/sums per event type.
    * On a streaming input, set `watermark` (e.g. "2 hours") to bound state;
    * pass None for batch (the plan is identical minus the watermark node).
    */
  def hourlyEventStats(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, watermark: Option[String]): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    src
      .groupBy(
        window(col(tsCol), "1 hour").as("w"),
        col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // Sum in exact decimal (order-independent), surface as double:
        // a distributed double sum would be partition-order dependent.
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }
}

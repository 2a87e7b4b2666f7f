package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series completeness operators.
  *
  * Aggregated event tables silently omit empty buckets: a per-hour count
  * has no row for an hour with no events, so downstream consumers
  * (training-curve dashboards, rate-anomaly monitors, seasonality
  * features) misread absence as a gap in the data rather than a zero.
  * Gap-filling densifies the series: every (key, bucket) in the observed
  * time range gets a row, missing buckets at zero.
  */
object TimeSeries {

  /** Dense hourly counts per `keyCol`: one row for EVERY (key, hour) in
    * the observed global [min, max] hour range, zero-filled.
    *
    * Shape at scale: the sparse counts are one map-side-combined
    * aggregation; the dense grid is distinct-keys × explode(sequence) —
    * narrow after a one-row bounds broadcast — and the left join runs on
    * (key, hour), the same key the counts aggregation just produced, so
    * AQE plans it without a second shuffle of the counts. Output volume
    * is keys × hours BY DESIGN (a dense series is the contract); bound
    * the range or the key set upstream if that product is too large.
    */
  def gapfillHourly(df: DataFrame, tsCol: String, keyCol: String): DataFrame = {
    val counts = df
      .groupBy(date_trunc("hour", col(tsCol)).as("hour_start"),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"))
    val bounds = counts.agg(min("hour_start").as("__lo"),
      max("hour_start").as("__hi"))
    val keys = df.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 hour"))).as("hour_start"))
    grid.join(counts, Seq(keyCol, "hour_start"), "left")
      .select(col(keyCol), col("hour_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }
}

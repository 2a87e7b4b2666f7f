package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Event-time sessionization with Spark's native session_window: a
    * session closes after `gap` of per-key silence. Works on batch and
    * streaming inputs alike (the declarative counterpart of the batch
    * lag+cumsum formulation in the `events_sessionize` query). On a
    * stream, the watermark bounds session state.
    */
  def sessionWindows(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: Option[String]): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    src
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }

  /** Streaming deduplication on `keyCols`. With a watermark (streaming
    * mode) this is `dropDuplicatesWithinWatermark`: the first row per key
    * wins and per-key state is EVICTED once the key's event time falls
    * behind the watermark — a 100 TB/day stream holds only the dedup keys
    * of the watermark horizon, never the history. Without a watermark
    * (batch mirror) it is a plain dropDuplicates on the same keys.
    *
    * This is arrival-order ("first seen wins") dedup — the right semantics
    * for an ingest stream. The batch operators in [[graft.ops.Dedup]] are
    * the deterministic (min tie-break) form for data at rest.
    */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: Option[String]): DataFrame =
    watermark match {
      case Some(w) =>
        events.withWatermark(tsCol, w).dropDuplicatesWithinWatermark(keyCols)
      case None => events.dropDuplicates(keyCols)
    }

  /** Event-time stream-stream INNER join: each left event pairs with the
    * right events of the same key whose event time lands in
    * [leftTs, leftTs + horizon] — the attribution join (click → purchase
    * within the hour) that works identically on batch DataFrames and on
    * two live streams.
    *
    * On streams, set `watermark` on BOTH sides: together with the
    * time-range predicate it bounds the join state — each side holds only
    * the watermark+horizon window of events, never the history, which is
    * what makes the join runnable forever on a 100 TB/day stream. Inner
    * join results emit as soon as both rows have arrived (no watermark
    * wait); the watermark only evicts state and drops late input.
    *
    * Callers rename the payload columns apart beforehand (the two sides
    * usually come from the same source); only `keyCol` may collide — it is
    * equi-joined and deduplicated here.
    */
  def joinStreams(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, horizon: String,
      watermark: Option[String]): DataFrame = {
    val l = watermark.fold(left)(left.withWatermark(leftTsCol, _))
    val r = watermark.fold(right)(right.withWatermark(rightTsCol, _))
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTsCol) >= l(leftTsCol) &&
        r(rightTsCol) <= l(leftTsCol) + expr(s"INTERVAL $horizon"),
      "inner")
      .drop(r(keyCol))
  }

  /** Stream-static enrichment: every micro-batch of the stream joins
    * against a STATIC dimension table — the stateless workhorse of
    * production streams (attach the user's segment / the device's model
    * to each event as it arrives). Unlike a stream-stream join this
    * keeps NO state: Spark re-plans the join per micro-batch, so with
    * `broadcastDim` (the default, and the only sane choice for a
    * dimension that fits in memory) each batch is a broadcast hash join
    * — no shuffle of the stream side, no watermark, runnable forever.
    * Left join by contract: an event whose key is missing from the
    * dimension passes through with nulls rather than silently dropping
    * (monitoring counts must not change because a dim row is late).
    *
    * The same call works on two batch DataFrames (the [[joinStreams]]
    * convention) — which is exactly how the batch-mirror gate replays it.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      keyCol: String, broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, Seq(keyCol), "left")
  }

  /** Arbitrary-state streaming: a per-key running counter maintained with
    * mapGroupsWithState (the escape hatch when windowed aggregation can't
    * express the state machine). Emits (key, totalSoFar) on every
    * micro-batch that touches the key. State is one long per key —
    * bounded, partitioned by key, nothing on the driver.
    */
  def runningCountsPerKey(events: Dataset[(String, Long)])(
      implicit spark: SparkSession): Dataset[(String, Long)] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (key, total)
      }
  }

  /** Streaming THROTTLE — the [[graft.ops.Behavior.throttle]] semantics
    * (keep an event iff >= `gapSeconds` after the last KEPT event of its
    * key; first per key kept) over an unbounded stream:
    * `flatMapGroupsWithState` holding one long (last kept micros) per
    * key. Input rows are (key, tsMicros, id); output the kept rows.
    *
    * Equivalence contract (spec-asserted): fed any prefix of a key's
    * events IN EVENT-TIME ORDER, the emitted set equals the batch
    * operator on the same rows — the state is exactly the batch scan's
    * loop variable. Within a micro-batch, rows sort by (ts, id) before
    * the scan so arrival interleaving cannot flip a decision; ACROSS
    * micro-batches the contract (as with every rate-limit stream) is
    * in-order delivery per key — a session/watermark stage upstream
    * provides it.
    */
  def throttleStream(events: Dataset[(Long, Long, Long)],
      gapSeconds: Long)(
      implicit spark: SparkSession): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val gapMicros = gapSeconds * 1000000L
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[Long]) =>
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val kept = rows.toSeq.sortBy(r => (r._2, r._3)).filter {
            case (_, t, _) =>
              if (lastKept == Long.MinValue || t - lastKept >= gapMicros) {
                lastKept = t; true
              } else false
          }
          if (kept.nonEmpty) state.update(lastKept)
          kept.iterator
      }
  }
}

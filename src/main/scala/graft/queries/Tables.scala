package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared table readers for the driver-contract queries (and dev probes). */
private[graft] object Tables {

  /** The driver's testdata generator has shipped `events.parquet` with
    * two different physical timestamp types across rounds: TIMESTAMP
    * NANOS (int64 nanos — Spark's schema inference REJECTS it unless the
    * global legacy conf `spark.sql.legacy.parquet.nanosAsLong` is set)
    * and plain TIMESTAMP MICROS (int64 micros — inference succeeds).
    * Readers here detect the file's unit from the footer once per path
    * and NORMALIZE to long MICROS, so every consumer sees one contract
    * regardless of which generation wrote the file — a silent unit
    * mismatch shifts every absolute-time result by 1000x (the round-9
    * regression: the regenerated µs data made the old unconditional
    * `div 1000` collapse all of 2024 onto 1970-01-20).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Per-path unit detection: true when native schema inference reads
    * `ts` as a (micro) TimestampType; false when inference rejects the
    * file (the nanos generation) or yields a raw long. Cached — one
    * footer read per path per JVM.
    */
  private val nativeMicros =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def isNativeMicros(spark: SparkSession, path: String): Boolean =
    nativeMicros.computeIfAbsent(path, { p =>
      try spark.read.parquet(p).schema("ts").dataType match {
        // isAdjustedToUTC=false parquet micros infer as NTZ; either way
        // the stored int64 is micros-since-epoch
        case TimestampType | TimestampNTZType => true
        case _                                => false
      } catch { case _: Exception => false }
    })

  /** events with `ts` as raw MICROS-since-epoch long, whichever unit the
    * file stores (ns -> integer-divided by 1000; a double division would
    * lose precision above 2^53). An NTZ-typed micros column casts through
    * TimestampType under the UTC session timezone every graft session
    * pins, which is exactly how DuckDB reads the same naive values.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val p = s"$dir/events.parquet"
    if (isNativeMicros(spark, p))
      spark.read.parquet(p)
        .withColumn("ts", unix_micros(col("ts").cast(TimestampType)))
    else
      spark.read.schema(eventsSchema).parquet(p)
        .withColumn("ts", expr("ts div 1000"))
  }

  /** events with `ts` as a (micro-precision) timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir).withColumn("ts", timestamp_micros(col("ts")))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared table readers for the driver-contract queries (and dev probes). */
private[graft] object Tables {

  /** The events table stores NANOSECOND timestamps, which Spark's parquet
    * schema INFERENCE rejects unless the global legacy conf
    * `spark.sql.legacy.parquet.nanosAsLong` is set. Supplying an explicit
    * reader schema (ts: long) bypasses inference entirely, so no session
    * conf is mutated inside query builders (order-dependent leakage in a
    * shared session).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** events with `ts` as raw nanos-since-epoch long. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")

  /** events with `ts` converted to a timestamp via INTEGER division to
    * micros (a double division would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir).withColumn("ts", timestamp_micros(expr("ts div 1000")))
}

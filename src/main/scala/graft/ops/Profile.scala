package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the ANALYZE-style pass a pipeline runs before/after a
  * transformation to sanity-check its inputs and outputs (row counts,
  * null density, cardinality, value bounds per column).
  *
  * One aggregation pass over the table: all per-column statistics compute
  * in a single `agg` (the multi-distinct goes through Spark's expand,
  * still one scan), and the one-row wide result is unpivoted with
  * `stack` — no per-column re-scan, nothing on the driver.
  */
object Profile {

  /** One output row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_value, max_value) — bounds
    * as strings so mixed-type tables profile into one frame.
    *
    * `exact = true` (the oracle-gate default) counts distincts exactly;
    * the multi-distinct EXPAND multiplies the shuffle by the number of
    * profiled columns, which is the real cost at corpus scale. At 100 TB
    * pass `exact = false`: HyperLogLog++ (`approx_count_distinct`) keeps
    * the pass single-shuffle and constant-memory per column, at the price
    * of an engine-specific estimate (hence not the gate path).
    */
  def table(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val nd: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (exact) count_distinct(_) else approx_count_distinct(_)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      nd(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stack = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ") +
      ") AS (column, __nonnull, n_distinct, min_value, max_value)"
    wide.selectExpr("__n", stack)
      .select(col("column"), col("__n").as("n_rows"),
        (col("__n") - col("__nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}

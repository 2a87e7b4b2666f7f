package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching.
  *
  * Spark's `approx_count_distinct` (HyperLogLog++) is the production
  * default, but its estimates are engine-specific — useless under a
  * cross-engine exactness gate. KMV (k-minimum-values, Bar-Yossef et al.
  * 2002) is the deterministic alternative: hash every value, keep the k
  * smallest distinct hashes; if fewer than k exist the count is exact,
  * otherwise estimate (k-1) * D / h_k with D the hash domain and h_k the
  * k-th smallest hash. Same md5-derived h32 as everything else, so any
  * engine reproduces the estimate bit-for-bit.
  *
  * Scale shape: distinct-of-hashes is one shuffle on a long; the k-smallest
  * selection is Spark's TakeOrderedAndProject (per-partition top-k, then a
  * k-row merge on the driver) — no global sort materializes.
  */
object Sketches {

  import TextFunctions.{P, h32}

  /** (exact_distinct, kmv_estimate) for `valueCol`, as one-row DataFrame.
    * The exact count rides along to make the estimate auditable.
    */
  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val hashes = df.select(h32(valueCol.cast("string")).as("h")).distinct()
    val smallest = hashes.orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
    val exact = df.select(valueCol.as("v")).distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    exact.crossJoin(smallest).select(
      col("exact_distinct"),
      when(col("n") < k, col("n").cast("double"))
        .otherwise(round(lit((k - 1).toDouble) * P / col("hk"), 4))
        .as("kmv_estimate"))
  }
}

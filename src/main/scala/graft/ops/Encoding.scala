package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoding: map string category columns to dense
  * integer ids through an explicit, reproducible vocabulary — the
  * train-time prep for embedding tables and label columns.
  */
object Encoding {

  /** Vocabulary for one column: (value, id), id = 1-based rank of the
    * value in sorted order — fully order-deterministic, no dependence on
    * partitioning or insertion order (unlike zipWithIndex-style ids).
    *
    * The single-partition window runs over the DISTINCT set only: the
    * corpus-sized input reduces to the vocabulary via a map-side-combined
    * aggregation first, and categorical vocabularies are small by
    * definition. That boundary is ENFORCED, not just documented: the
    * distinct count is checked against `maxVocab` (default 1e6 — past
    * that the single-partition sort and the downstream broadcast both
    * stop being the right plan) and a violation fails loudly with the
    * scale-safe alternatives named, instead of silently funneling a
    * URL- or user-id-sized key set through one partition. The count is
    * an extra job over the already-reduced distinct set only.
    */
  def vocab(df: DataFrame, column: String,
      maxVocab: Long = 1000000L): DataFrame = {
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val values = df.select(col(column).as("value"))
      .where(col("value").isNotNull).distinct()
    // count is bounded via a limit: the guard costs |vocab| rows at
    // most, never a full count of a pathological key set
    val seen = values.limit(
      (maxVocab + 1).min(Int.MaxValue.toLong).toInt).count()
    if (seen > maxVocab)
      throw new IllegalArgumentException(
        s"vocab('$column') exceeds maxVocab=$maxVocab distinct values: " +
          "dense ranks over one partition are the wrong tool for " +
          "high-cardinality keys — hash the column (xxhash64), dedup it " +
          "(Dedup.exact), or raise maxVocab knowingly")
    values.withColumn("id",
      row_number().over(Window.orderBy("value")).cast("long"))
  }

  /** Adds `<col>_id` next to each listed category column via a broadcast
    * left join per column (nulls stay null). The corpus side never
    * shuffles: each vocabulary ships to the executors whole.
    */
  def encode(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to encode")
    cols.foldLeft(df) { (acc, c) =>
      val v = vocab(df, c)
        .withColumnRenamed("value", s"__v_$c")
        .withColumnRenamed("id", s"${c}_id")
      acc.join(broadcast(v), acc(c) === v(s"__v_$c"), "left")
        .drop(s"__v_$c")
    }
  }
}

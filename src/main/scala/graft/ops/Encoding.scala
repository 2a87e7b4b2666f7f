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
    * definition. (For high-cardinality keys — URLs, user ids — dense
    * ranks are the wrong tool; hash or dedup instead.)
    */
  def vocab(df: DataFrame, column: String): DataFrame =
    df.select(col(column).as("value")).where(col("value").isNotNull)
      .distinct()
      .withColumn("id", row_number().over(Window.orderBy("value")).cast("long"))

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

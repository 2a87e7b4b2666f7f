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

  /** Leave-one-out TARGET encoding: replace a category with the mean of
    * the numeric target over the category's OTHER rows —
    * loo_i = (S_c − y_i)/(n_c − 1) — the high-cardinality-safe encoding
    * [[vocab]] refuses dense ids for, and the leakage-safe variant of
    * naive mean encoding (including row i's own target hands the model
    * the label; LOO is the K-fold limit at K = n). Singleton categories
    * and NULL categories fall back to the GLOBAL mean (their own row is
    * the whole group — nothing to leave out).
    *
    * Determinism: per-category sums are exact DECIMAL(38,0) over ×2^20
    * fixed-point targets; each encoding is the pinned expression
    * (S − y)·double / 2^20 / (n − 1), 6dp-rounded. Output
    * (idCol, catCol, target_loo).
    *
    * Shape at scale: one map-side-combined category aggregate, one
    * category-keyed join back (AQE broadcasts it when the cardinality
    * is small; unlike [[vocab]] nothing here needs a bounded
    * vocabulary), one one-row global broadcast.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
      targetCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val fp = 1048576d
    val slim = graft.util.Caches.persist(
      df.where(col(targetCol).isNotNull)
        .select(col(idCol), col(catCol).cast("string").as("__c"),
          round(col(targetCol).cast("double") * fp).cast("long")
            .as("__yfp")))
    val g = slim.where(col("__c").isNotNull).groupBy("__c")
      .agg(sum(col("__yfp").cast(dec)).as("__s"),
        count(lit(1)).as("__n"))
    val tot = slim.agg(sum(col("__yfp").cast(dec)).as("__ts"),
      count(lit(1)).as("__tn"))
    slim.join(g, Seq("__c"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("__c").as(catCol),
        (round(when(col("__n") > 1,
          (col("__s") - col("__yfp").cast(dec)).cast("double") / fp
            / (col("__n") - 1).cast("double"))
          .otherwise(col("__ts").cast("double") / fp
            / col("__tn").cast("double")), 6) + lit(0d))
          .as("target_loo"))
  }

  /** Weight-of-evidence encoding + information value — the credit-
    * scoring-standard supervised categorical encoding (Siddiqi,
    * "Credit Risk Scorecards", 2006; public classical technique): per
    * level of `catCol` against a binary `labelCol`,
    *
    *   woe_i = ln( ((pos_i + α)/(POS + k·α)) / ((neg_i + α)/(NEG + k·α)) )
    *   iv    = Σ_i (ps_i − ns_i) · woe_i
    *
    * with Laplace smoothing α (default 0.5) over the k observed levels —
    * zero-cell levels stay finite instead of ±∞. WOE is the encoding a
    * downstream linear model consumes (monotone in the level's positive
    * rate, centered so the corpus log-odds cancel); IV is the standard
    * screening readout (rule of thumb: < 0.02 useless, > 0.5 suspect —
    * a leakage flag for training-data curation, the
    * [[graft.ops.Drift.mutualInformation]] sibling with directed,
    * model-ready units).
    *
    * Rows with a NULL level or label drop (not encoded, not counted —
    * the [[targetEncodeLoo]] convention). Determinism: level counts are
    * exact longs; woe/iv_term are pinned-order double expressions; the
    * cross-level IV sum accumulates ×2^20 fixed-point longs
    * (order-insensitive — the engine-wide convention).
    *
    * Shape at scale: ONE map-side-combined group aggregate (level
    * cardinality), a one-row totals broadcast, per-level scalar
    * expressions, one level-cardinality fixed-point sum broadcast back.
    * The corpus never shuffles. Output one row per level:
    * (level, n, n_pos, n_neg, woe, iv_term, iv).
    */
  def woe(df: DataFrame, catCol: String, labelCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val counts = graft.util.Caches.persist(
      df.where(col(catCol).isNotNull && col(labelCol).isNotNull)
        .select(col(catCol).cast("string").as("level"),
          col(labelCol).cast("boolean").as("__y"))
        .groupBy("level")
        .agg(count(lit(1)).as("n"),
          sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos")))
    val tot = counts.agg(count(lit(1)).as("__k"),
      sum("n_pos").as("__tp"),
      sum(col("n") - col("n_pos")).as("__tn"))
    val scored = counts
      .crossJoin(broadcast(tot))
      .select(col("level"), col("n"), col("n_pos"),
        (col("n") - col("n_pos")).as("n_neg"),
        ((col("n_pos").cast("double") + lit(alpha)) /
          (col("__tp").cast("double") + col("__k").cast("double")
            * lit(alpha))).as("__ps"),
        (((col("n") - col("n_pos")).cast("double") + lit(alpha)) /
          (col("__tn").cast("double") + col("__k").cast("double")
            * lit(alpha))).as("__ns"))
      .select(col("level"), col("n"), col("n_pos"), col("n_neg"),
        log(col("__ps") / col("__ns")).as("__woe"),
        ((col("__ps") - col("__ns")) * log(col("__ps") / col("__ns")))
          .as("__ivt"))
    val staged = graft.util.Caches.persist(scored)
    // cross-level IV: micro-unit longs, order-insensitive
    val iv = staged.agg(
      sum(round(col("__ivt") * 1048576d).cast("long")).as("__iv6"))
    staged.crossJoin(broadcast(iv))
      .select(col("level"), col("n"), col("n_pos"), col("n_neg"),
        (round(col("__woe"), 6) + lit(0d)).as("woe"),
        (round(col("__ivt"), 6) + lit(0d)).as("iv_term"),
        (round(col("__iv6").cast("double") / 1048576d, 6) + lit(0d))
          .as("iv"))
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

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the ANALYZE-style pass a pipeline runs before/after a
  * transformation to sanity-check its inputs and outputs (row counts,
  * null density, cardinality, value bounds per column).
  *
  * The exact path aggregates each column twice-level (group by value,
  * then count the groups): every per-column job is a narrow, map-side
  * partially aggregated pass over ONE pruned parquet column, and the
  * shuffle carries only the distinct values of that column. The obvious
  * alternative — all columns in a single `agg` with multiple
  * `count_distinct`s — plans as an EXPAND that multiplies every input row
  * by (columns + 1) before the shuffle, which measured 2-4x slower at
  * sf0.1 and grows with the column count at corpus scale.
  */
object Profile {

  /** One output row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_value, max_value) — bounds
    * as strings so mixed-type tables profile into one frame.
    *
    * `exact = true` (the oracle-gate default) counts distincts exactly
    * via the per-column group-then-count plan above: total IO = each
    * profiled column read once (same bytes as the one-scan form), shuffle
    * = distinct values only, memory bounded by the map-side hash of
    * per-partition distincts. At 100 TB with a pathological all-unique
    * column, pass `exact = false`: HyperLogLog++
    * (`approx_count_distinct`) keeps the whole profile single-scan,
    * single-shuffle and constant-memory per column, at the price of an
    * engine-specific estimate (hence not the gate path).
    */
  /** Per-group z-score outlier flagging — the numeric data-cleaning pass
    * (drop sensor glitches, price typos, corrupt metrics) run before a
    * table feeds training. Adds `z` (6dp) and `is_outlier`
    * (|value - mean| > sigma * std of the row's `byCols` group; a
    * zero-variance group flags nothing).
    *
    * Group moments use order-insensitive fixed-point (×2^20) sums
    * accumulated in DECIMAL(38,0) — exact under any partitioning AND
    * overflow-free for any |value| below ~3e8 at any group size (exactly
    * the corrupt-value regime this op targets; a long accumulator would
    * silently clamp round(v²·2^20) above |v|≈2.9e6). The flag is
    * deterministic and engine-replayable. Shape at scale: one
    * map-side-combined aggregation
    * down to the group table, joined back on the group keys (broadcast
    * when groups are few, sort-merge otherwise); the fact table shuffles
    * at most once. Rows with a NULL group key drop out (equi-join
    * semantics) — scrub or coalesce group keys first.
    */
  def outliers(df: DataFrame, valueCol: String, byCols: Seq[String],
      sigma: Double = 3.0): DataFrame = {
    require(byCols.nonEmpty, "at least one grouping column")
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val scale = (1L << 20).toDouble
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(byCols.map(col): _*).agg(
      sum(round(v * scale).cast("decimal(38,0)")).as("__s"),
      sum(round(v * v * scale).cast("decimal(38,0)")).as("__ss"),
      count(v).as("__n"))
    val m = col("__s").cast("double") / col("__n") / scale
    val ex2 = col("__ss").cast("double") / col("__n") / scale
    val moments = stats.select(byCols.map(col) :+ m.as("__m")
      :+ sqrt(greatest(ex2 - m * m, lit(0d))).as("__sd"): _*)
    df.join(moments, byCols)
      // + 0.0 normalizes IEEE negative zero across replay engines
      .withColumn("z", round(
        when(col("__sd") > 0, (v - col("__m")) / col("__sd")).otherwise(0d), 6)
        + lit(0d))
      .withColumn("is_outlier",
        col("__sd") > 0 && abs(v - col("__m")) > lit(sigma) * col("__sd"))
      .drop("__m", "__sd")
  }

  /** Per-group MAD (median-absolute-deviation) outlier flagging — the
    * robust complement to [[outliers]]: mean/std themselves are dragged
    * by the very tails they're meant to flag (one 1e9 typo shifts a
    * group's mean arbitrarily), while the median and MAD have a 50%
    * breakdown point, so the flag stays meaningful in exactly the
    * corrupt-data regime a curation pipeline runs this for. Adds
    * `robust_z` (the Iglewicz-Hoaglin modified z-score
    * 0.6745·(v - median)/MAD, 6dp) and `is_outlier` (|robust_z| > k,
    * conventionally k = 3.5); a zero-MAD group (>=50% identical values)
    * flags nothing.
    *
    * Both statistics are DISCRETE percentiles (actual data values, the
    * SQL-standard cume_dist >= p definition Spark's percentile_disc and
    * DuckDB's quantile_disc share), so every derived double is IEEE
    * arithmetic on bit-identical inputs — engine-replayable with no
    * fixed-point machinery. Shape at scale: two group aggregations
    * (median, then MAD of deviations) each shuffling only the group
    * table back; the fact table shuffles at most once per join, and
    * both joins broadcast when groups are few.
    */
  def outliersMad(df: DataFrame, valueCol: String, byCols: Seq[String],
      k: Double = 3.5): DataFrame = {
    require(byCols.nonEmpty, "at least one grouping column")
    require(k > 0, s"k must be positive, got $k")
    val v = col(valueCol).cast("double")
    val med = df.where(v.isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY `$valueCol`)")
        .cast("double").as("__med"))
    val withMed = df.join(med, byCols).withColumn("__dev", abs(v - col("__med")))
    val mad = withMed.groupBy(byCols.map(col): _*)
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY `__dev`)")
        .as("__mad"))
    withMed.join(mad, byCols)
      // + 0.0 normalizes IEEE negative zero across replay engines
      .withColumn("robust_z", round(
        when(col("__mad") > 0,
          lit(0.6745) * (v - col("__med")) / col("__mad")).otherwise(0d), 6)
        + lit(0d))
      .withColumn("is_outlier",
        col("__mad") > 0 && abs(col("robust_z")) > k)
      .drop("__med", "__dev", "__mad")
  }

  /** Per-group Pearson correlation of two numeric columns — the feature
    * redundancy / leakage screen run before columns feed a model (a 0.99
    * correlation between a feature and the label usually means leakage,
    * between two features means one is dead weight).
    *
    * All five sufficient statistics (Σx, Σy, Σx², Σy², Σxy) accumulate as
    * ×2^20 fixed-point DECIMAL(38,0) sums — exact under any partitioning,
    * so the final double formula evaluates identical IEEE steps on any
    * engine. One map-side-combined aggregation; output is one row per
    * group, never the data. A zero-variance side yields corr = 0 (flagged
    * by n; the convention keeps the output total).
    *
    * Magnitude bound (same class as [[outliers]]): the per-row products
    * x², y², x·y are doubles, so the ×2^20 fixed-point representation is
    * EXACT only while |product| stays under ~2^33 (~8.6e9); beyond that
    * round() still evaluates identically on both engines (determinism
    * holds — the gate cannot flake) but the statistic quietly inherits
    * double rounding. Winsorize or rescale first for wide-range columns.
    */
  def correlation(df: DataFrame, xCol: String, yCol: String,
      byCols: Seq[String]): DataFrame = {
    require(byCols.nonEmpty, "at least one grouping column")
    val scale = (1L << 20).toDouble
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    def fp(c: org.apache.spark.sql.Column) =
      sum(round(c * scale).cast("decimal(38,0)"))
    val stats = df.where(x.isNotNull && y.isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(fp(x).as("__sx"), fp(y).as("__sy"), fp(x * x).as("__sxx"),
        fp(y * y).as("__syy"), fp(x * y).as("__sxy"),
        count(lit(1)).as("n"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double") / scale
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val den = sqrt(greatest(n * d("__sxx") - d("__sx") * d("__sx"), lit(0d))) *
      sqrt(greatest(n * d("__syy") - d("__sy") * d("__sy"), lit(0d)))
    stats.select(byCols.map(col) :+ col("n") :+
      // + 0.0 normalizes IEEE negative zero across replay engines
      (round(when(den > 0, num / den).otherwise(0d), 6) + lit(0d))
        .as("corr"): _*)
  }

  /** Per-group ordinary least squares y ~ x — the readout companion to
    * [[correlation]] (corr says "related"; the fit says BY HOW MUCH per
    * unit): slope, intercept, r² and n per group, from the same ×2^20
    * fixed-point DECIMAL(38,0) sufficient statistics (Σx, Σy, Σxy, Σx²,
    * Σy² — exact under any partitioning), one map-side-combined
    * aggregate per group and pinned-order final doubles, so any engine
    * replays the coefficients bit-for-bit.
    *
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²); intercept = (Σy − b·Σx)/n;
    * r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)). Zero x
    * variance → slope/intercept/r² NULL (no line to fit); zero y
    * variance with x variance → slope 0, r² NULL (the 0/0 convention of
    * [[correlation]] resolved to NULL rather than a fake perfect fit).
    * NULL x or y rows are excluded. Magnitude caveat: |x·y|·2^20 must
    * fit the per-row long quantization — the [[Pca.covariance]] bound.
    */
  def linearFit(df: DataFrame, xCol: String, yCol: String,
      byCols: Seq[String]): DataFrame = {
    require(byCols.nonEmpty, "at least one grouping column")
    val scale = (1L << 20).toDouble
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    def fp(c: org.apache.spark.sql.Column) =
      sum(round(c * scale).cast("decimal(38,0)"))
    val stats = df.where(x.isNotNull && y.isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(fp(x).as("__sx"), fp(y).as("__sy"), fp(x * x).as("__sxx"),
        fp(y * y).as("__syy"), fp(x * y).as("__sxy"),
        count(lit(1)).as("n"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double") / scale
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    val slope = num / varX
    stats.select(byCols.map(col) :+ col("n") :+
      (round(when(varX > 0, slope), 6) + lit(0d)).as("slope") :+
      (round(when(varX > 0, (d("__sy") - slope * d("__sx")) / n), 6)
        + lit(0d)).as("intercept") :+
      (round(when(varX > 0 && varY > 0, num * num / (varX * varY)), 6)
        + lit(0d)).as("r2"): _*)
  }

  /** Fixed-width histogram of a numeric column: (bin, bin_start, n) with
    * bin = floor(value / binWidth) — the distribution view `table`'s
    * min/max can't give (skew, modes, heavy tails) before choosing
    * partition counts, salt factors or filter thresholds. Integer floor
    * division on a scaled long keeps the bin edges engine-exact; nulls
    * are dropped (they're counted by [[table]]).
    *
    * One map-side-combined aggregation on the bin id — output rows =
    * occupied bins, never the data.
    */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = floor(col(valueCol).cast("double") / binWidth).cast("long")
    df.where(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), round(col("bin") * binWidth, 6).as("bin_start"),
        col("n"))
  }

  /** Exact discrete-percentile bounds of `valueCol` at the given
    * probabilities, as a single broadcastable one-row frame with columns
    * `b0, b1, ...`. percentile_disc picks an actual data value (no
    * interpolation), so the bounds are engine-exact under the SQL-standard
    * cume_dist >= p definition shared by Spark and DuckDB's
    * quantile_disc.
    */
  private def discBounds(df: DataFrame, valueCol: String,
      ps: Seq[Double]): DataFrame =
    df.where(col(valueCol).isNotNull).selectExpr(
      ps.zipWithIndex.map { case (p, i) =>
        s"percentile_disc($p) WITHIN GROUP (ORDER BY `$valueCol`) AS b$i"
      }: _*)

  /** Equi-depth binning: assign each non-null row a quantile bin in
    * [1, nBins] and return the input with a `bin` column appended.
    *
    * Unlike a global ntile (one total sort of the corpus), this computes
    * the nBins-1 exact boundary values first (one aggregate), broadcasts
    * them, and assigns bins with a narrow comparison — so the data pass
    * is shuffle-free and equal values always land in the same bin
    * (bin = 1 + #bounds strictly below the value), which also makes the
    * assignment deterministic without a tie-break ordering.
    */
  def bucketizeQuantile(df: DataFrame, valueCol: String,
      nBins: Int = 4): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val bounds = discBounds(df, valueCol, ps)
    val bin = ps.indices
      .map(i => when(col(valueCol) > col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    df.where(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bin", bin)
      .drop(ps.indices.map(i => s"b$i"): _*)
  }

  /** Winsorization: clamp `valueCol` into its [pLo, pHi] discrete
    * percentiles, appended as `winsorized` — the standard guard against
    * corrupt-value tails before moments/normalization. Bounds are actual
    * data values (percentile_disc), the clamp is least/greatest with no
    * arithmetic, so output doubles are bit-copies of inputs or bounds and
    * replay exactly in any engine. One aggregate + one narrow pass.
    */
  def winsorize(df: DataFrame, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0<=pLo<pHi<=1, got $pLo,$pHi")
    val bounds = discBounds(df, valueCol, Seq(pLo, pHi))
    df.where(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("winsorized",
        least(greatest(col(valueCol), col("b0")), col("b1")))
      .drop("b0", "b1")
  }

  /** Within-group percentile rank of `valueCol`: (rank − 1) / (n − 1)
    * under the TOTAL order (value, id) — tie-broken by id so the rank is
    * deterministic on any engine; single-member groups rank 0.0. The
    * score-normalization step that makes quality scores comparable ACROSS
    * strata (a 0.9-percentile web doc and a 0.9-percentile books doc mean
    * the same thing even when the raw score scales differ), feeding
    * threshold-free mixture recipes. Rounded to 6 dp for cross-engine
    * hash stability.
    *
    * One shuffle on the group key; per-group window sort — scale-safe
    * whenever groups are numerous relative to cores, the same plan class
    * as [[graft.ops.Sampling.perStratumHead]]. For a single global group
    * use [[graft.ops.Sampling.topFraction]]'s distributed-rank machinery
    * instead.
    */
  def percentileRank(df: DataFrame, valueCol: String, idCol: String,
      byCols: Seq[String]): DataFrame = {
    require(byCols.nonEmpty,
      "byCols must be non-empty (global rank would single-partition; " +
        "use Sampling.topFraction for the global form)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(byCols.map(col): _*)
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.withColumn("pct_rank", round(percent_rank().over(w), 6))
  }

  /** Snapshot-to-snapshot profile drift — the data-quality regression
    * check run between two versions of a table (yesterday's load vs
    * today's, pre- vs post-migration): per column, both snapshots'
    * row/null/distinct counts and value bounds side by side plus a
    * `drifted` flag when any of them moved. Catches silent data loss,
    * null inflation, cardinality collapse and range excursions before a
    * downstream consumer does.
    *
    * Cost = two [[table]] profiles (each column read once per snapshot,
    * shuffles carry distinct values only) joined on the column NAME —
    * a columns-count-sized join, independent of data size.
    */
  def drift(before: DataFrame, after: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    val a = table(before, cols, exact)
    val b = table(after, cols, exact)
    val stats = Seq("n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
    val joined = a.select(col("column") +:
        stats.map(s => col(s).as(s"${s}_before")): _*)
      .join(b.select(col("column") +:
        stats.map(s => col(s).as(s"${s}_after")): _*), Seq("column"))
    // null-safe comparison: an all-null column profiles to NULL bounds,
    // which must read as "no drift", not a NULL flag
    joined.withColumn("drifted",
      stats.map(s => !(col(s"${s}_before") <=> col(s"${s}_after")))
        .reduce(_ || _))
  }

  def table(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    if (exact) {
      cols.map { c =>
        // Group counts per value: the null group's count is n_nulls, the
        // non-null group count is n_distinct, their cnt-sum is n_rows.
        df.select(col(c))
          .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
          .agg(
            coalesce(sum("__cnt"), lit(0L)).as("n_rows"),
            coalesce(sum(when(col(c).isNull, col("__cnt"))), lit(0L))
              .as("n_nulls"),
            count(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_value"),
            max(col(c)).cast("string").as("max_value"))
          .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_.unionAll(_))
    } else {
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        approx_count_distinct(col(c)).as(s"__nd_$c"),
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

  /** Join-skew diagnosis BEFORE running a join: per-key row counts on
    * each side and the exact join-output contribution n_left * n_right,
    * top `k` keys by that product — the keys that will dominate (or
    * sink) the shuffle. The pre-flight check for salting decisions
    * ([[Joins.saltedJoin]]) and AQE skew thresholds.
    *
    * Shape at scale: two map-side-combined per-key counts (the shuffle
    * carries one partial per key per partition, not rows), one keyed
    * join of those count tables, and a TakeOrderedAndProject top-k —
    * never a global sort, never the data itself. Keys absent from one
    * side contribute 0 and are dropped (they produce no join output).
    */
  def joinSkew(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    lc.join(rc, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("est_rows"))
      .orderBy(col("est_rows").desc, col("key"))
      .limit(k)
  }

  /** Benford first-digit profile of a numeric column — the fraud /
    * synthetic-data / unit-mixup detector: naturally-occurring magnitudes
    * follow P(d) = log10(1 + 1/d); generated or truncated data doesn't.
    * Rows with |value| < 1 or NULL are ignored (no stable first decimal
    * digit). Output per observed digit 1-9:
    * (digit, n, share, expected_share, deviation) where `share` is one
    * long/long double division, `expected_share` is a PLAN-TIME literal
    * (no engine evaluates a log — the [[Retrieval.rankEval]] NDCG-
    * discount convention), and deviation = share − expected.
    *
    * Digit extraction is string-first on the truncated integer part
    * (`substring(cast(floor(abs(v)) as long as string), 1, 1)`) — the
    * one form that evaluates identically on any SQL engine, with no
    * float-formatting or log10/power round-trip in sight.
    *
    * Shape at scale: one narrow projection, one map-side-combined
    * 9-group count, one broadcast of the one-row total. Streams at any
    * size.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = abs(col(valueCol).cast("double"))
    val digit = substring(floor(v).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = df.where(v >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__t"))
    val expected = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val expectedCol = element_at(
      array(expected.map(e => lit(e)): _*), col("digit"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("__t")).as("share"),
        expectedCol.as("expected_share"),
        ((col("n").cast("double") / col("__t")) - expectedCol)
          .as("deviation"))
  }

  /** One-row corpus HEALTH REPORT — the "is this corpus shippable"
    * audit a curation pipeline runs before training: exact-duplicate
    * rate (content digests), PII incidence, language breadth, mean
    * document length, dominant-source concentration. One stage, one
    * row, every number exact.
    *
    * Shape at scale: each statistic is its own two-stage aggregation
    * (the digest/lang distincts are separate distinct+count passes — a
    * combined multi-distinct would plan the row-multiplying Expand this
    * engine's profiler deliberately avoids), all reduced to one-row
    * frames and broadcast-crossJoined; the only non-trivial shuffle
    * ships 32-byte digests.
    */
  def corpusReport(df: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val base = df.agg(count(lit(1)).as("n_docs"),
      sum(length(col(textCol)).cast("long")).as("__chars"))
    val dTexts = df.select(sha2(col(textCol), 256).as("__d")).distinct()
      .agg(count(lit(1)).as("n_distinct_texts"))
    val dLangs = df.select(col(langCol)).distinct()
      .agg(count(lit(1)).as("n_langs"))
    val piiDocs = Pii.stats(df, idCol, textCol)
      .agg(sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii_docs"))
    val top = df.groupBy(col(sourceCol).as("top_source"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("top_source"))
      .limit(1)
    base.crossJoin(broadcast(dTexts)).crossJoin(broadcast(dLangs))
      .crossJoin(broadcast(piiDocs)).crossJoin(broadcast(top))
      .select(col("n_docs"),
        (col("n_docs") - col("n_distinct_texts")).as("n_exact_dups"),
        round((col("n_docs") - col("n_distinct_texts")).cast("double")
          / col("n_docs"), 6).as("dup_rate"),
        col("n_pii_docs"),
        round(col("n_pii_docs").cast("double") / col("n_docs"), 6)
          .as("pii_rate"),
        col("n_langs"),
        round(col("__chars").cast("double") / col("n_docs"), 6)
          .as("mean_chars"),
        col("top_source"),
        round(col("__n").cast("double") / col("n_docs"), 6)
          .as("top_source_share"))
  }

  /** Pearson correlation MATRIX over `cols` in long format (i, j,
    * corr[6dp]) for i <= j — the multi-column generalization of
    * [[correlation]]'s single pair, sharing [[Pca.covariance]]'s
    * per-partition Gram machinery (ONE corpus pass, k(k+1)/2 + k + 1
    * rows per partition to the shuffle, k = column count).
    *
    * Columns are pre-scaled by their exact max(|x|) (correlation is
    * scale-invariant; the scaling keeps every fixed-point partial inside
    * a long at ANY value magnitude — raw prices would overflow the
    * quantized Gram sums). corr = cov_ij / √(cov_ii·cov_jj) computed
    * from the 6dp covariance table on both engines, NULL when either
    * variance is zero. Columns must be NON-NULL (the Gram pass is exact
    * and a silent null-drop would bias every moment — pre-repair with
    * [[DataQuality.imputeMode]] or filter explicitly).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val maxes = df.agg(max(abs(col(cols.head).cast("double"))),
        cols.tail.map(c => max(abs(col(c).cast("double")))): _*)
      .head.toSeq.map(v => Option(v).map(_.asInstanceOf[Double])
        .filter(_ > 0).getOrElse(1.0))
    val vec = df.select(array(cols.zip(maxes).map { case (c, m) =>
      col(c).cast("double") / lit(m) }: _*).as("embedding"))
      .withColumn("vec_id", monotonically_increasing_id())
    val cov = Pca.covariance(vec, "vec_id", "embedding", cols.size)
    val diag = cov.where(col("i") === col("j"))
      .select(col("i").as("__d"), col("cov").as("__v"))
    cov
      .join(broadcast(diag.withColumnRenamed("__d", "__di")
        .withColumnRenamed("__v", "__vi")), col("i") === col("__di"))
      .join(broadcast(diag.withColumnRenamed("__d", "__dj")
        .withColumnRenamed("__v", "__vj")), col("j") === col("__dj"))
      .select(col("i"), col("j"),
        (when(col("__vi") > 0 && col("__vj") > 0,
          round(col("cov") / sqrt(col("__vi") * col("__vj")), 6))
          + lit(0d)).as("corr"))
  }

  /** Gini coefficient of `valueCol` per group — the [0,1) inequality /
    * concentration readout for corpus composition (token share across
    * sources, purchase value across users): 0 = perfectly even,
    * →1 = one member owns everything. A training mix whose per-source
    * token Gini is high is dominated by a few sources no matter how
    * long the source list looks. Non-negative values required (the
    * classic Gini is undefined below zero) — violations fail loudly.
    *
    * Exact rank-free formulation over per-VALUE counts: with c_v
    * occurrences of value v and C_v the count strictly below v,
    * Σ_i (2i − n − 1)·x_i = Σ_v x_v·c_v·(2C_v + c_v − 1 − n), so
    * G = that / (n·Σx) — every factor an exact integer (values ×2^20
    * fixed-point, products in DECIMAL(38,0)), one final double
    * division. Output per group: (byCols…, n, gini) — NULL when the
    * group's value sum is zero.
    *
    * Shape at scale: one (group, value) map-side-combined count, a
    * per-group window over VALUE-CARDINALITY rows (the per-stratum
    * window class — scale-safe when groups are numerous relative to
    * cores), one group rollup.
    */
  def gini(df: DataFrame, valueCol: String,
      byCols: Seq[String]): DataFrame = {
    require(byCols.nonEmpty, "need at least one grouping column")
    val scale = 1048576d
    val dec = "decimal(38,0)"
    val bad = df.where(col(valueCol) < 0).limit(1).collect()
    require(bad.isEmpty,
      s"gini('$valueCol') requires non-negative values")
    val vc = df.where(col(valueCol).isNotNull)
      .select(byCols.map(col) :+
        round(col(valueCol).cast("double") * scale).cast("long")
          .as("__v"): _*)
      .groupBy(byCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(byCols.map(col): _*).orderBy("__v")
    val withCum = vc
      .withColumn("__cum", sum("__c").over(w) - col("__c"))
    withCum
      .groupBy(byCols.map(col): _*)
      .agg(sum("__c").as("n"),
        sum(col("__v").cast(dec) * col("__c").cast(dec)).as("__sx"),
        sum(col("__v").cast(dec) * col("__c").cast(dec)
          * (col("__cum").cast(dec) * 2 + col("__c").cast(dec) - 1))
          .as("__num0"))
      .select(byCols.map(col) :+ col("n") :+
        (round(when(col("__sx") > 0,
          (col("__num0").cast("double")
            - (col("n") - 1).cast("double")
              * col("__sx").cast("double"))
            / (col("n").cast("double") * col("__sx").cast("double"))), 6)
          + lit(0d)).as("gini"): _*)
  }

  /** Per-group TRIMMED mean: the mean of `valueCol` restricted to its
    * group's [pLo, pHi] percentile band (interpolated bounds, inclusive)
    * — the robust location estimate that survives corrupt tails without
    * winsorize's value rewriting. Output: (byCols…, n_kept,
    * trimmed_mean[6dp]).
    *
    * Determinism: bounds via exact interpolated percentiles (Spark
    * `percentile` == DuckDB `quantile_cont`, the engine's established
    * equivalence); the mean via fixed-point long sums reduced in
    * DECIMAL — order-insensitive, engine-exact.
    *
    * Shape at scale: two group-keyed aggregations (bounds, then the
    * trimmed mean) + one broadcast join of the group-cardinality bounds
    * table — the fact table shuffles on the group key only.
    */
  def trimmedMean(df: DataFrame, valueCol: String, byCols: Seq[String],
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(byCols.nonEmpty, "at least one group column")
    require(0 <= pLo && pLo < pHi && pHi <= 1,
      s"need 0<=pLo<pHi<=1, got $pLo,$pHi")
    val S = graft.ops.Similarity.FixedScale
    val bounds = df.where(col(valueCol).isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, $pLo)").as("__lo"),
        expr(s"percentile(`$valueCol`, $pHi)").as("__hi"))
    df.where(col(valueCol).isNotNull)
      .join(broadcast(bounds), byCols)
      .where(col(valueCol).between(col("__lo"), col("__hi")))
      .groupBy(byCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"),
        sum(round(col(valueCol).cast("double") * S)
          .cast("decimal(38,0)")).as("__s"))
      .withColumn("trimmed_mean",
        round(col("__s").cast("double") / col("n_kept") / S, 6) + lit(0d))
      .drop("__s")
  }
}

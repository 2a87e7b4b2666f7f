package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
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

  /** Seasonality-aware deviation flags over the dense hourly grid: each
    * (key, hour) bucket is compared to ITS OWN hour-of-day's mean — the
    * time-of-day profile a global threshold (or [[graft.ops.Profile]]'s
    * MAD composition in `events_anomaly`) is blind to: 3 a.m. traffic is
    * not anomalous for being below the daily mean, only for deviating
    * from other 3 a.m.'s. Output one row per (key, hour_start):
    * (key, hour_start, hod, n_events, hod_mean, ratio, anomalous), with
    * hod_mean = exact long sum / bucket count (one IEEE division),
    * ratio = n/hod_mean rounded 6dp, anomalous when ratio is outside
    * [lo, hi] (a zero mean flags any nonzero count).
    *
    * Runs over [[gapfillHourly]]'s grid so absent hours COUNT as zeros in
    * their hour-of-day baseline — on sparse data the observed-only mean
    * would be biased high and the quietest (most anomaly-prone) hours
    * would vanish from their own baseline. Shape at scale: the gapfill
    * plan plus one (key, hod)-keyed map-side-combined aggregate joined
    * back on (key, hod) — grid-sized, never event-sized.
    */
  def seasonalDeviation(df: DataFrame, tsCol: String, keyCol: String,
      lo: Double = 0.25, hi: Double = 4.0): DataFrame =
    seasonalDeviationBy(df, tsCol, keyCol, lo, hi, "hod",
      c => hour(c).cast("long"))

  /** Hour-of-WEEK seasonal deviation flags (round 16): the 168-cell
    * weekly profile [[seasonalDeviation]]'s 24-cell daily profile is
    * blind to — weekday-vs-weekend structure (Monday 9 a.m. is not
    * anomalous for dwarfing Sunday 9 a.m., only for deviating from
    * other Monday 9 a.m.'s). Bucket index `how` = dow·24 + hour with
    * dow 0 = Sunday (Spark `dayofweek` − 1 == DuckDB `dow` — the pinned
    * cross-engine convention). Same grid-sized shape: the gapfill plan
    * plus ONE (key, how)-keyed map-side-combined aggregate joined back
    * — 168 baseline cells per key, never event-sized. Output
    * (key, hour_start, how, n_events, how_mean, ratio, anomalous).
    */
  def seasonalDeviationWeekly(df: DataFrame, tsCol: String,
      keyCol: String, lo: Double = 0.25, hi: Double = 4.0): DataFrame =
    seasonalDeviationBy(df, tsCol, keyCol, lo, hi, "how",
      c => ((dayofweek(c) - 1) * 24 + hour(c)).cast("long"))

  /** Time-of-WEEK-aware robust anomalies (round 17) — the composition
    * closing the gap between the two existing monitors: the gapfill∘MAD
    * chain (events_anomaly) flags cells against the GLOBAL per-key
    * median, so every busy Monday 9 a.m. trips on a weekend-heavy
    * corpus; [[seasonalDeviationWeekly]] is seasonal but threshold-
    * based (fixed ratio band, no spread model). This subtracts each
    * cell's OWN 168-cell weekly baseline first — resid = n_events −
    * how_mean, 6dp-snapped so the MAD grid replays exactly — and runs
    * [[Profile.outliersMad]]'s modified-z machinery per key on the
    * residuals: anomalous = deviates from ITS time-of-week norm by
    * more than k robust sigmas of the key's residual spread.
    *
    * Shape at scale: the grid-sized weekly-deviation plan plus two
    * (key)-keyed discrete-percentile aggregates and broadcast joins —
    * everything after the gapfill is grid-cardinality work. Output
    * (flagged cells only): (key, hour_start, how, n_events, how_mean,
    * resid, robust_z).
    */
  def seasonalAnomalyWeekly(df: DataFrame, tsCol: String,
      keyCol: String, k: Double = 3.5): DataFrame = {
    // persisted: outliersMad joins its input back THREE times (median,
    // deviation, MAD) — without the cache the whole gapfill+baseline
    // plan would re-execute per consumer
    val dev = graft.util.Caches.persist(
      seasonalDeviationWeekly(df, tsCol, keyCol)
        .withColumn("resid",
          round(col("n_events").cast("double") - col("how_mean"), 6)
            + lit(0d)))
    Profile.outliersMad(dev, "resid", Seq(keyCol), k)
      .where(col("is_outlier"))
      .select(col(keyCol), col("hour_start"), col("how"),
        col("n_events"), col("how_mean"), col("resid"), col("robust_z"))
  }

  /** Shared seasonal-baseline machinery: compare every (key, hour) cell
    * of the dense grid against the mean of ITS OWN seasonal bucket
    * (`bucketOf(hour_start)`), exact long sum / count division, 6dp
    * ratio, [lo, hi] flags — zero-mean buckets flag any nonzero count.
    */
  private def seasonalDeviationBy(df: DataFrame, tsCol: String,
      keyCol: String, lo: Double, hi: Double, bucketName: String,
      bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    require(lo >= 0 && hi > lo, s"need 0 <= lo < hi, got [$lo, $hi]")
    val meanName = s"${bucketName}_mean"
    val dense = gapfillHourly(df, tsCol, keyCol)
    val withB = dense.withColumn(bucketName, bucketOf(col("hour_start")))
    val baseline = withB.groupBy(col(keyCol), col(bucketName))
      .agg(sum("n_events").as("__s"), count(lit(1)).as("__n"))
      .select(col(keyCol), col(bucketName),
        (col("__s").cast("double") / col("__n")).as(meanName))
    withB.join(baseline, Seq(keyCol, bucketName))
      .select(col(keyCol), col("hour_start"), col(bucketName),
        col("n_events"), col(meanName),
        (round(when(col(meanName) > 0,
          col("n_events").cast("double") / col(meanName))
          .otherwise(when(col("n_events") > 0, lit(hi + 1)).otherwise(lit(1.0))), 6)
          + lit(0d)).as("ratio"))
      .withColumn("anomalous", col("ratio") < lo || col("ratio") > hi)
  }

  /** Autocorrelation function r_1..r_maxLag per key over the dense
    * hourly count series (gaps count as zeros — [[gapfillHourly]]'s
    * grid, without which a bursty source's silent hours would vanish
    * from their own correlation structure): the standard periodicity /
    * burstiness readout — a daily-rhythm source shows a peak at lag 24,
    * white-noise ingestion decays immediately, a near-1 r_1 means the
    * series is ramp-dominated and rate alarms need differencing first.
    *
    * r_k = Σ_{t}(x_t−m)(x_{t+k}−m) / Σ(x_t−m)² with the FULL-series
    * mean m (the classic sample ACF). Computed from EXACT integer
    * sums via the expansion num_k = S_k − m·(A_k+B_k) + c_k·m²,
    * den = Q − N·m² — S/A/B/Q are DECIMAL(38,0) cross sums
    * (order-insensitive, engine-exact), m one IEEE division, the rest
    * a pinned-order scalar expression per (key, lag) row. A constant
    * series (den = 0) emits NULL.
    *
    * Shape at scale: the gapfill grid, one lag-explode (maxLag copies
    * of the GRID, not the events), one (key, hour)-keyed equi-join of
    * grid-sized tables, two map-side-combined aggregates — everything
    * after the first rollup is grid-cardinality work. Output
    * (key, lag, n_pairs, acf).
    */
  def acf(df: DataFrame, tsCol: String, keyCol: String,
      maxLag: Int = 24): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val dec = "decimal(38,0)"
    val dense = graft.util.Caches.persist(
      gapfillHourly(df, tsCol, keyCol)
        .select(col(keyCol),
          expr("unix_timestamp(hour_start) div 3600").as("__h"),
          col("n_events").cast(dec).as("__x")))
    val base = dense.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum("__x").as("__s"),
        sum(col("__x") * col("__x")).as("__q"))
    val left = dense
      .select(col(keyCol), col("__h"), col("__x").as("__xa"),
        explode(array((1 to maxLag).map(lit): _*)).as("lag"))
      .withColumn("__hb", col("__h") + col("lag"))
    val pairs = left
      .join(dense.select(col(keyCol), col("__h").as("__hb"),
        col("__x").as("__xb")), Seq(keyCol, "__hb"))
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("__c"), sum("__xa").as("__a"),
        sum("__xb").as("__b"), sum(col("__xa") * col("__xb")).as("__sk"))
    pairs.join(base, Seq(keyCol))
      .withColumn("__m", col("__s").cast("double") / col("__n"))
      .select(col(keyCol), col("lag").cast("long").as("lag"),
        col("__c").as("n_pairs"),
        when(col("__q").cast("double")
            - col("__n").cast("double") * col("__m") * col("__m") > 0,
          round((col("__sk").cast("double")
            - col("__m") * (col("__a") + col("__b")).cast("double")
            + col("__c").cast("double") * col("__m") * col("__m"))
            / (col("__q").cast("double")
              - col("__n").cast("double") * col("__m") * col("__m")), 6)
            + lit(0d))
          .as("acf"))
  }

  /** Pairwise banded dynamic-time-warping distance between the dense
    * hourly count series of every key pair (Sakoe & Chiba 1978; Berndt
    * & Clifford 1994) — the alignment-tolerant series similarity the
    * lag-pinned tools ([[acf]], [[seasonalDeviation]]) cannot give:
    * two keys whose load curves are the same shape shifted or locally
    * stretched by a few hours read as near-identical under DTW and as
    * uncorrelated under fixed-lag comparison. The curation read:
    * cluster event/domain types by activity shape, spot the one whose
    * traffic shape diverged.
    *
    * Series are [[gapfillHourly]]'s zero-filled hourly counts over the
    * GLOBAL observed range (every key the same length, so the band
    * always admits a path); `band` is the Sakoe-Chiba radius — cells
    * with |i−j| > band are unreachable, bounding both cost (O(len ·
    * band) per pair) and pathological warpings. The DP runs as ONE
    * native codegen'd kernel per key pair ([[Expressions.DtwBanded]]);
    * every cell is |Δ| + min of identical doubles, so the distance is
    * bit-deterministic and replays exactly in the oracle's
    * anti-diagonal recursion.
    *
    * Output: (key_a, key_b, n_a, n_b, dtw) for every unordered key
    * pair, key_a < key_b. Shape at scale: series assembly is one
    * map-side-combined aggregate + one bounded collect_list per key
    * (length = hours of history — `maxLen` guards a runaway range
    * LOUDLY, it is never event-volume-bounded); the pair join is
    * keys², broadcast on one side — the operator's contract is "few
    * keys, long histories", the [[theilSen]] cost note inverted.
    */
  def dtw(df: DataFrame, tsCol: String, keyCol: String, band: Int = 24,
      maxLen: Int = 16384): DataFrame = {
    require(band >= 0, s"band must be >= 0, got $band")
    val V = graft.functions.VectorFunctions
    val series = graft.util.Caches.persist(
      gapfillHourly(df, tsCol, keyCol)
        .groupBy(col(keyCol))
        .agg(transform(
          sort_array(collect_list(struct(
            expr("unix_timestamp(hour_start) div 3600").as("__h"),
            col("n_events").cast("double").as("__x")))),
          e => e.getField("__x")).as("__v")))
    val worst = series.agg(coalesce(max(size(col("__v"))), lit(0)))
      .collect().head.getInt(0)
    require(worst <= maxLen,
      s"dtw: a series spans $worst hourly buckets (> maxLen=$maxLen); " +
        "the DP is O(len * band) per pair and the series is a collected " +
        "array — bound the time range upstream or raise maxLen")
    val a = series.select(col(keyCol).as("key_a"), col("__v").as("__va"))
    val b = series.select(col(keyCol).as("key_b"), col("__v").as("__vb"))
    a.join(broadcast(b), col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        size(col("__va")).cast("long").as("n_a"),
        size(col("__vb")).cast("long").as("n_b"),
        V.dtwBanded(col("__va"), col("__vb"), band).as("dtw"))
  }

  /** Theil–Sen robust trend slope per key over the dense hourly count
    * series — the median of all pairwise slopes
    * (x_j − x_i)/(h_j − h_i), i < j: up to 29% corrupt points cannot
    * move it (an OLS slope chases every spike — [[forecastEval]]'s
    * scorecard inputs need the robust trend, not the contaminated one).
    * Output per key: (key, n_hours, n_pairs, slope) with slope the
    * exact interpolated median (Spark `percentile` == DuckDB
    * `quantile_cont`), 6dp, −0 normalized.
    *
    * Shape at scale: the pair explosion is per-key TIME², bounded by
    * the series length (hours of history), never by event volume —
    * 1 year of hourly buckets is 38M pairs per key, embarrassingly
    * parallel after the one grid shuffle. Pairs never cross keys.
    */
  def theilSen(df: DataFrame, tsCol: String, keyCol: String): DataFrame = {
    val dense = graft.util.Caches.persist(
      gapfillHourly(df, tsCol, keyCol)
        .select(col(keyCol),
          expr("unix_timestamp(hour_start) div 3600").as("__h"),
          col("n_events").cast("long").as("__x")))
    val pairs = dense.join(
      dense.select(col(keyCol), col("__h").as("__h2"),
        col("__x").as("__x2")), Seq(keyCol))
      .where(col("__h2") > col("__h"))
      .select(col(keyCol),
        ((col("__x2") - col("__x")).cast("double")
          / (col("__h2") - col("__h")).cast("double")).as("__s"))
    pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(__s, 0.5)").as("__med"))
      .join(dense.groupBy(col(keyCol)).agg(count(lit(1)).as("n_hours")),
        Seq(keyCol))
      .select(col(keyCol), col("n_hours"), col("n_pairs"),
        (round(col("__med"), 6) + lit(0d)).as("slope"))
  }

  /** Mann–Kendall trend test per key over the dense hourly count
    * series — the nonparametric "is there ANY monotone trend"
    * significance companion to [[theilSen]]'s slope magnitude:
    * S = Σ_{i<j} sign(x_j − x_i), Var(S) = [n(n−1)(2n+5) −
    * Σ_ties t(t−1)(2t+5)]/18, z = (S∓1)/√Var with the classic
    * continuity correction (z = 0 when S = 0). Exact integer S and
    * tie sums (DECIMAL(38,0)); z one pinned-order double; `p_value`
    * (round 16) = two-sided normal erfc(|z|/√2) via the
    * [[graft.functions.PValues]] pinned kernel, computed in-plan from
    * the UNROUNDED z. Output per key:
    * (key, n_hours, s, var_s, z, p_value).
    *
    * Shape at scale: the same per-key TIME²-bounded pair pass as
    * [[theilSen]] plus a value-cardinality tie rollup.
    */
  def mannKendall(df: DataFrame, tsCol: String,
      keyCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val dense = graft.util.Caches.persist(
      gapfillHourly(df, tsCol, keyCol)
        .select(col(keyCol),
          expr("unix_timestamp(hour_start) div 3600").as("__h"),
          col("n_events").cast("long").as("__x")))
    val s = dense.join(
      dense.select(col(keyCol), col("__h").as("__h2"),
        col("__x").as("__x2")), Seq(keyCol))
      .where(col("__h2") > col("__h"))
      .groupBy(col(keyCol))
      .agg(sum(when(col("__x2") > col("__x"), 1L)
        .when(col("__x2") < col("__x"), -1L).otherwise(0L))
        .as("s"))
    val ties = dense.groupBy(col(keyCol), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__nv"), sum({
        val t = col("__t").cast(dec)
        t * (t - 1) * (t * 2 + 5)
      }).as("__tsum"))
    val base = dense.groupBy(col(keyCol)).agg(count(lit(1)).as("n_hours"))
    val nn = col("n_hours").cast("double")
    val varS = (nn * (nn - 1) * (nn * 2 + 5)
      - col("__tsum").cast("double")) / 18.0
    val zRaw = when(varS > 0 && col("s") > 0,
        (col("s").cast("double") - 1) / sqrt(varS))
      .when(varS > 0 && col("s") < 0,
        (col("s").cast("double") + 1) / sqrt(varS))
      .otherwise(lit(0d))
    base.join(s, Seq(keyCol)).join(ties, Seq(keyCol))
      .select(col(keyCol), col("n_hours"), col("s"),
        (round(varS, 6) + lit(0d)).as("var_s"),
        (round(zRaw, 6) + lit(0d)).as("z"),
        (round(graft.functions.PValues.pTwoSidedZCol(zRaw), 6) + lit(0d))
          .as("p_value"))
  }

  /** Per-key rolling window aggregate: for every event, the count and
    * (exact decimal) sum of the key's events in the trailing
    * `[t - windowSeconds, t]` RANGE — the moving-average / rate feature
    * over event time. A RANGE frame (not ROWS) makes ties irrelevant:
    * equal-timestamp peers are always all included, so the result is
    * deterministic under any layout.
    *
    * Shape at scale: one shuffle on the key; each key's frame scan is
    * independent — the per-stratum-window plan class, scale-safe when
    * keys are numerous relative to cores. The sum accumulates in
    * DECIMAL(18,2) (order-independent, engine-exact) and surfaces as
    * double.
    */
  def rolling(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    df.select(col("*"), unix_micros(col(tsCol)).as("ts_us"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        sum(col(valueCol).cast("decimal(18,2)")).over(w)
          .cast("double"))
  }

  /** Per-key rolling MEDIAN over the trailing `k` observations (row
    * frame, total order (ts, id)) — the robust smoother: a mean-based
    * window ([[rolling]]) is dragged by exactly the spikes a cleaning
    * pass wants to see THROUGH, while the median of the last k values
    * ignores up to (k−1)/2 outliers. Median = the lower-middle DISCRETE
    * element (an actual data value at rank ceil(n/2) of the sorted
    * frame — the quantile_disc convention every robust op in this
    * engine shares), so the output doubles are bit-copies of inputs and
    * replay exactly on any engine. The frame is the non-null
    * OBSERVATIONS among the trailing k rows: NULL values neither enter
    * the sorted frame nor count toward `n_frame` (collect_list skips
    * them), matching a `count(value) OVER w` replay — a row whose value
    * is missing is not an observation.
    *
    * Shape at scale: one key-partitioned window whose state is the
    * k-bounded frame — collect/sort cost is O(k log k) per row with k a
    * small constant, and nothing shuffles but the key partitioning.
    */
  def rollingMedian(df: DataFrame, tsCol: String, keyCol: String,
      idCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol).cast("timestamp")).asc,
        col(idCol).asc)
      .rowsBetween(-(k - 1), 0)
    val frame = sort_array(collect_list(col(valueCol).cast("double"))
      .over(w))
    df.withColumn("n_frame", size(frame).cast("long"))
      .withColumn("rolling_median",
        element_at(frame, ceil(size(frame) / 2.0).cast("int")))
  }

  /** Per-key exponentially weighted moving average:
    * s_1 = x_1; s_t = alpha * x_t + (1 - alpha) * s_{t-1} under the total
    * order (ts, id) — the classic smoothing/anomaly baseline. The
    * recurrence is inherently SEQUENTIAL per key, so (like
    * [[graft.ops.Sampling.packSequences]]) the keys are the parallelism:
    * one hash shuffle on the key, one in-order pass per key inside
    * mapPartitions, state resets on key change — no window, no driver
    * round-trip, per-key work bounded by that key's history.
    *
    * Determinism: `alpha * x + (1 - alpha) * s` is a fixed IEEE operation
    * sequence, so any engine replaying the same order reproduces the
    * state BIT-FOR-BIT — the emitted column is the raw double,
    * deliberately un-rounded: a finite-binary-fraction state (alpha
    * 0.25, cent-valued inputs) lands on exact mid-point decimals where
    * HALF_UP (Spark) and float-multiply rounding (DuckDB) disagree, so
    * 6 dp rounding would BREAK cross-engine equality here, not help it.
    */
  def ewma(df: DataFrame, tsCol: String, keyCol: String, idCol: String,
      valueCol: String, alpha: Double, numPartitions: Int = 0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val beta = 1 - alpha
    val slim = df.select(col(idCol).cast("long").as("id"),
        col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts"),
        col(valueCol).cast("double").as("v"))
      .repartition(n, col("key"))
      .sortWithinPartitions("key", "ts", "id")
    val out: Dataset[(Long, Long, Long, Double)] = slim.mapPartitions { rows =>
      var curKey = Long.MinValue
      var first = true
      var s = 0.0
      rows.map { r =>
        val id = r.getLong(0); val k = r.getLong(1)
        val t = r.getLong(2); val v = r.getDouble(3)
        if (first || k != curKey) { curKey = k; first = false; s = v }
        else s = alpha * v + beta * s
        (id, k, t, s)
      }
    }
    out.toDF(idCol, keyCol, "ts_us", "ewma")
  }

  /** Per-key Holt double exponential smoothing — [[ewma]] with a trend
    * state, the standard short-horizon forecaster for drifting series
    * (a pure EWMA lags a trending signal by design; Holt's trend term
    * closes that gap). Under the total (ts, id) order per key:
    *   s_1 = x_1;  b_1 = 0
    *   s_t = alpha * x_t + (1 - alpha) * (s_{t-1} + b_{t-1})
    *   b_t = beta * (s_t - s_{t-1}) + (1 - beta) * b_{t-1}
    * emitting per row the level `s_t`, trend `b_t`, and the one-step
    * forecast `s_t + b_t` (what the NEXT observation is predicted to be
    * — the residual against it is the drift-alarm statistic).
    *
    * Determinism: same contract as [[ewma]] — a fixed IEEE operation
    * sequence replayed per key in (ts, id) order is bit-reproducible on
    * any engine, and the outputs are deliberately un-rounded (see the
    * [[ewma]] scaladoc for why rounding would break equality). Callers
    * wanting exact binary arithmetic pick alpha/beta with finite binary
    * fractions (0.5, 0.25); any values in (0,1] are accepted.
    *
    * Shape at scale: identical to [[ewma]] — one hash shuffle on the
    * key, one in-order pass per key inside mapPartitions, two doubles of
    * state, reset on key change.
    */
  def holt(df: DataFrame, tsCol: String, keyCol: String, idCol: String,
      valueCol: String, alpha: Double, beta: Double,
      numPartitions: Int = 0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta > 0 && beta <= 1, s"beta must be in (0,1], got $beta")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ac = 1 - alpha
    val bc = 1 - beta
    val slim = df.select(col(idCol).cast("long").as("id"),
        col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts"),
        col(valueCol).cast("double").as("v"))
      .repartition(n, col("key"))
      .sortWithinPartitions("key", "ts", "id")
    val out: Dataset[(Long, Long, Long, Double, Double, Double)] =
      slim.mapPartitions { rows =>
        var curKey = Long.MinValue
        var first = true
        var s = 0.0
        var b = 0.0
        rows.map { r =>
          val id = r.getLong(0); val k = r.getLong(1)
          val t = r.getLong(2); val v = r.getDouble(3)
          if (first || k != curKey) { curKey = k; first = false; s = v; b = 0.0 }
          else {
            val sPrev = s
            s = alpha * v + ac * (s + b)
            b = beta * (s - sPrev) + bc * b
          }
          (id, k, t, s, b, s + b)
        }
      }
    out.toDF(idCol, keyCol, "ts_us", "level", "trend", "forecast")
  }

  /** Per-key one-sided CUSUM change detection — the sequential drift
    * monitor over event streams: with x in exact micro-units
    * (floor(value · 1e6)) and k = floor((target + slack) · 1e6),
    *   s_0 = 0;  s_t = max(0, s_{t-1} + x_t - k)
    * under the total (ts, id) order, alarming when s_t > h. All state
    * arithmetic is LONG — any engine replaying the same order
    * reproduces s bit-for-bit, and the floor()s are single fixed IEEE
    * ops on the raw double before integer space takes over.
    *
    * Shape at scale: the [[ewma]] class — the recurrence is inherently
    * sequential PER KEY, so keys are the parallelism: one hash shuffle,
    * one in-order pass per key inside mapPartitions, state resets on
    * key change. Output: (id, key, ts_us, s_fp, alarm).
    */
  def cusum(df: DataFrame, tsCol: String, keyCol: String, idCol: String,
      valueCol: String, target: Double, slack: Double,
      threshold: Double, numPartitions: Int = 0): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val kFp = math.floor((target + slack) * 1000000d).toLong
    val hFp = math.floor(threshold * 1000000d).toLong
    val slim = df.select(col(idCol).cast("long").as("id"),
        col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts"),
        floor(col(valueCol).cast("double") * 1000000d).cast("long").as("xfp"))
      .repartition(n, col("key"))
      .sortWithinPartitions("key", "ts", "id")
    val out: Dataset[(Long, Long, Long, Long, Boolean)] =
      slim.mapPartitions { rows =>
        var curKey = Long.MinValue
        var first = true
        var s = 0L
        rows.map { r =>
          val id = r.getLong(0); val k = r.getLong(1)
          val t = r.getLong(2); val x = r.getLong(3)
          if (first || k != curKey) { curKey = k; first = false; s = 0L }
          s = math.max(0L, s + x - kFp)
          (id, k, t, s, s > hFp)
        }
      }
    out.toDF(idCol, keyCol, "ts_us", "s_fp", "alarm")
  }

  /** Interval → bucket utilization: each [start_us, end_us) interval
    * spreads its duration over the fixed `bucketSeconds` calendar
    * buckets it overlaps; output is the per-(key, bucket) total overlap
    * in microseconds — machine-utilization / billing / session-density
    * rollups from raw interval tables. Zero-length and inverted
    * intervals are dropped (require end > start to contribute).
    *
    * Determinism: pure long arithmetic (floor-div bucket assignment,
    * min/max clamping, exact sums). Shape at scale: one narrow explode
    * (an interval lands in duration/bucketSeconds + 1 buckets) and one
    * map-side-combined sum keyed (key, bucket) — no joins; output
    * volume is Σ buckets-per-interval BY DESIGN, bound the bucket size
    * to the query granularity.
    */
  def intervalUtilization(df: DataFrame, keyCol: String,
      startUsCol: String, endUsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be positive, got $bucketSeconds")
    val bus = bucketSeconds * 1000000L
    val iv = df.select(col(keyCol),
        col(startUsCol).cast("long").as("__s"),
        col(endUsCol).cast("long").as("__e"))
      .where(col("__e") > col("__s"))
    iv.select(col(keyCol), col("__s"), col("__e"),
        explode(sequence(expr(s"__s div $bus"),
          expr(s"(__e - 1) div $bus"))).as("__b"))
      .select(col(keyCol), (col("__b") * bus).as("bucket_start_us"),
        (least(col("__e"), (col("__b") + 1) * bus)
          - greatest(col("__s"), col("__b") * bus)).as("__ov"))
      .groupBy(keyCol, "bucket_start_us")
      .agg(sum("__ov").as("overlap_us"))
  }

  /** Single best mean-shift changepoint per key: the split of the
    * ordered series that maximizes the between-segment sum-of-squares
    * reduction G(t) = n_l·n_r/n · (mean_l − mean_r)² — the binary-
    * segmentation step (Scott & Knott 1974; the building block PELT
    * iterates) that LOCALIZES a level shift where [[cusum]] only raises
    * a running alarm. The readout a pipeline wants when a source's
    * volume or value level steps: "WHEN did it move, and from what to
    * what".
    *
    * Output: one row per key `(key, split_ord, n_left, n_right,
    * mean_left, mean_right, score)` — the split assigns ord ≤ split_ord
    * to the left segment; keys with fewer than two observations emit
    * nothing (no valid split). Ties on G(t) break toward the earliest
    * split.
    *
    * Replay determinism: values enter as ×2^20 fixed-point longs, so
    * per-key prefix sums are exact; G(t) is then ONE scalar double
    * expression per candidate split over exact integers — identical
    * IEEE evaluation on any engine, so the argmax (with the explicit
    * ord tie-break) replays exactly. Computed as
    * G(t) = (S_l·n_r − S_r·n_l)² / (n_l·n_r·n) in the fixed-point
    * domain with the squared numerator in double (the exact-integer
    * inputs are ≪ 2⁵³ for realistic grids, so the double square is the
    * same value both engines compute).
    *
    * Shape at scale: per-key windows — one hash shuffle on the key,
    * prefix sums inside the per-key sort, argmax via one more window
    * over the same partitioning (no second shuffle). Series length per
    * key is the grid contract (callers bucket first, [[gapfillHourly]]
    * precedent), so no single-partition global stretch anywhere.
    */
  def changepoint(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val scale = (1L << 20).toDouble
    val perKey = w.partitionBy(col("key")).orderBy(col("__ord"))
    val whole = w.partitionBy(col("key"))
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val slim = df
      .where(col(ordCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).as("__ord"),
        round(col(valueCol).cast("double") * scale).cast("long").as("__v"))
    val pref = slim
      .withColumn("__nl", count(lit(1)).over(perKey))
      .withColumn("__sl", sum(col("__v")).over(perKey))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__s", sum(col("__v")).over(whole))
      .where(col("__nl") < col("__n")) // t = 1..n-1: right side non-empty
    val nl = col("__nl").cast("double")
    val nr = (col("__n") - col("__nl")).cast("double")
    val n = col("__n").cast("double")
    // S_l·n_r − S_r·n_l in exact long arithmetic, squared in double
    val num = (col("__sl") * (col("__n") - col("__nl"))
      - (col("__s") - col("__sl")) * col("__nl")).cast("double")
    val scored = pref.withColumn("__g",
      num * num / (nl * nr * n) / (scale * scale))
    scored
      .withColumn("__rk", row_number().over(
        w.partitionBy(col("key"))
          .orderBy(col("__g").desc, col("__ord").asc)))
      .where(col("__rk") === 1)
      .select(col("key"), col("__ord").as("split_ord"),
        col("__nl").as("n_left"),
        (col("__n") - col("__nl")).as("n_right"),
        (round(col("__sl").cast("double") / scale / nl, 6) + lit(0d))
          .as("mean_left"),
        (round((col("__s") - col("__sl")).cast("double") / scale / nr, 6)
          + lit(0d)).as("mean_right"),
        (round(col("__g"), 6) + lit(0d)).as("score"))
  }

  /** Per-key forecast accuracy scorecard over (actual, forecast) rows:
    * MAE, RMSE, MAPE (zero-actual rows excluded from its denominator),
    * sMAPE (zero-denominator rows excluded), and MASE — the scale-free
    * Hyndman & Koehler (2006) headline, |error| relative to the in-sample
    * one-step naive forecast, so "MASE < 1 beats carrying yesterday
    * forward" reads identically across series of any magnitude. The eval
    * half of the [[ewma]]/[[holt]] smoothers: join a model's one-step
    * predictions back to actuals and rank models per key.
    *
    * Output: one row per key `(key, n, mae, rmse, mape, smape, mase)`;
    * `mape`/`smape` are NULL when every row was excluded from their
    * denominators, `mase` is NULL for single-row series or flat-naive
    * (zero-denominator) series — NULL marks "not measurable", never 0.
    *
    * Replay determinism: each per-row term (|e|, e², |e|/|a|, the sMAPE
    * ratio, |a − lag(a)|) is one scalar double from the input doubles,
    * quantized ×2^20 to fixed-point longs whose sums are exact under any
    * partitioning — the [[graft.ops.Drift.cuped]] convention — with one
    * final double division (and one sqrt for RMSE) per metric.
    *
    * Shape at scale: one per-key window (for the naive lag) on the same
    * key the final aggregation groups by — one hash shuffle total, no
    * second exchange; everything else is map-side-combined sums.
    */
  def forecastEval(df: DataFrame, keyCol: String, ordCol: String,
      actualCol: String, forecastCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__ord"))
    val scale = (1L << 20).toDouble
    def fp(c: org.apache.spark.sql.Column) = sum(round(c * scale).cast("long"))
    val a = col("__a"); val f = col("__f")
    val err = abs(a - f)
    val slim = df
      .where(col(actualCol).isNotNull && col(forecastCol).isNotNull
        && col(ordCol).isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).as("__ord"),
        col(actualCol).cast("double").as("__a"),
        col(forecastCol).cast("double").as("__f"))
      .withColumn("__naive", abs(a - lag(a, 1).over(w)))
    val agg = slim.groupBy("key").agg(
      count(lit(1)).as("n"),
      fp(err).as("__sae"),
      fp((a - f) * (a - f)).as("__sse"),
      fp(when(a =!= 0d, err / abs(a))).as("__sape"),
      sum(when(a =!= 0d, 1L).otherwise(0L)).as("__nape"),
      fp(when(abs(a) + abs(f) > 0d,
        lit(2d) * err / (abs(a) + abs(f)))).as("__ssm"),
      sum(when(abs(a) + abs(f) > 0d, 1L).otherwise(0L)).as("__nsm"),
      fp(col("__naive")).as("__snaive"),
      count(col("__naive")).as("__nnaive"))
    def d(c: String) = col(c).cast("double") / scale
    val n = col("n").cast("double")
    agg.select(col("key"), col("n"),
      (round(d("__sae") / n, 6) + lit(0d)).as("mae"),
      (round(sqrt(d("__sse") / n), 6) + lit(0d)).as("rmse"),
      when(col("__nape") > 0L,
        round(d("__sape") / col("__nape").cast("double"), 6) + lit(0d))
        .as("mape"),
      when(col("__nsm") > 0L,
        round(d("__ssm") / col("__nsm").cast("double"), 6) + lit(0d))
        .as("smape"),
      when(col("__nnaive") > 0L && col("__snaive") > 0L,
        round((d("__sae") / n)
          / (d("__snaive") / col("__nnaive").cast("double")), 6) + lit(0d))
        .as("mase"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product-analytics operators over event streams: ordered
  * funnels, cohort retention, and event-transition (first-order Markov)
  * statistics. These are the classic OLAP workloads an analytics engine
  * is asked for the moment an `events` table exists — and for a training
  * -data pipeline they double as curation signals (session depth,
  * engagement cohorts, behavioral n-grams).
  *
  * Determinism contract: counts are exact longs; every ratio is a single
  * long/long double division (IEEE-exact, order-free); event order is the
  * total order (ts, event_id) so equal timestamps cannot flip results
  * between engines or layouts.
  */
object Behavior {

  /** Ordered funnel: for each step i > 1, a user counts as reaching step
    * i only with an event of type `steps(i)` STRICTLY AFTER their
    * earliest qualifying step-(i-1) event (the classic "first view, then
    * first click after that view, ..." chaining — min-timestamp
    * semantics, so one pass per step suffices and the result is
    * layout-free). Output: one row per step with reach and conversion
    * ratios.
    *
    * Shape at scale: step 1 is one map-side-combined min per user; each
    * later step is one join keyed on the user id — the SAME key every
    * round, so hash partitioning is reused — followed by another keyed
    * min. Per-step frontiers are persisted (each feeds both its own
    * count and the next step's probe) and unpersisted as soon as the
    * next generation lands; state is one row per surviving user, never
    * collected. Step count is the (small, static) funnel definition, not
    * data volume.
    */
  def funnel(df: DataFrame, tsCol: String, userCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got ${steps.mkString(", ")}")
    maxGapSeconds.foreach(g =>
      require(g > 0, s"maxGapSeconds must be positive, got $g"))
    val base = df.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var frontier = graft.util.Caches.persist(
      base.where(col("__t") === steps.head)
        .groupBy("__u").agg(min("__ts").as("__reach")))
    val perStep = Seq.newBuilder[DataFrame]
    perStep += frontier.select(lit(1).as("step_idx"),
      lit(steps.head).as("step_name"), col("__u"))
    for (i <- 1 until steps.size) {
      // strictly after the previous reach; with a conversion deadline,
      // also within maxGapSeconds of it (micro-exact interval arithmetic)
      val within: Column = maxGapSeconds match {
        case Some(g) => col("__ts") > col("__prev") &&
          col("__ts") <= col("__prev") + expr(s"interval $g seconds")
        case None    => col("__ts") > col("__prev")
      }
      val next = graft.util.Caches.persist(
        base.where(col("__t") === steps(i))
          .join(frontier.select(col("__u"), col("__reach").as("__prev")),
            "__u")
          .where(within)
          .groupBy("__u").agg(min("__ts").as("__reach")))
      perStep += next.select(lit(i + 1).as("step_idx"),
        lit(steps(i)).as("step_name"), col("__u"))
      frontier = next
    }
    // a step NOBODY reaches must still emit its row (n_users = 0) — the
    // union of non-empty frontiers alone would silently truncate the
    // funnel; ratios pin to 0.0 there (0/0 must not surface as NaN)
    val spark = df.sparkSession
    import spark.implicits._
    val stepTable = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step_idx", "step_name")
    val reach = perStep.result().reduce(_ union _)
      .groupBy("step_idx", "step_name")
      .agg(count(lit(1)).as("n_users"))
    val full = stepTable.join(reach, Seq("step_idx", "step_name"), "left")
      .select(col("step_idx"), col("step_name"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
    val w = Window.orderBy("step_idx")
    full
      .withColumn("conv_from_prev",
        when(col("n_users") === 0, lit(0.0)).otherwise(
          coalesce(col("n_users").cast("double")
            / lag(col("n_users"), 1).over(w), lit(1.0))))
      .withColumn("conv_from_first",
        when(col("n_users") === 0, lit(0.0)).otherwise(
          col("n_users").cast("double") / first(col("n_users")).over(w)))
  }

  /** Weekly cohort retention: users are assigned to the ISO week of
    * their FIRST event; every later event lands in `week_offset` =
    * whole weeks since that cohort week. Output: (cohort_week,
    * week_offset, n_users) — the retention triangle, distinct users per
    * cell. Both engines truncate weeks to Monday, and the day-diff of
    * two Monday-truncated dates is divisible by 7, so the offset is
    * exact integer arithmetic.
    *
    * Shape at scale: first-event assignment is one map-side-combined min
    * keyed on the user; the join back to events runs on that same key;
    * the final distinct-count shuffles (cohort_week, offset, user) once.
    * No window over the full event table, no driver state.
    */
  def cohortRetention(df: DataFrame, tsCol: String,
      userCol: String): DataFrame = {
    val firstSeen = df.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__first"))
      .select(col("__u"),
        date_trunc("week", col("__first")).cast("date").as("cohort_week"))
    df.select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__ew"))
      .join(firstSeen, "__u")
      .select(col("cohort_week"),
        (datediff(col("__ew"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"),
        col("__u"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("__u").as("n_users"))
  }

  /** Linear multi-touch attribution: every conversion event (type
    * `convType`) splits its `valueCol` EQUALLY across the same user's
    * touch events (type `touchType`) in the trailing
    * `[conv - windowSeconds, conv]` range (inclusive both ends — a touch
    * at the conversion instant counts). Output per touch:
    * (touch_id, n_conversions, credit_fp, credit) — total credit the
    * touch earned across all conversions it assisted.
    *
    * Determinism: per (conversion, touch) the credit is
    * floor(value · 1e6 / n_touches) in LONG micro-units — one fixed IEEE
    * multiply then exact integer floor-div — and a touch's total is an
    * exact long SUM, order-free. (A double credit sum would depend on
    * shuffle order.) Conversions with no in-window touch drop out — the
    * unattributable remainder, as in every last/linear-touch model.
    *
    * Shape at scale: one range join keyed on the user (the
    * [[graft.ops.Joins]] range-join class: both sides hash on user_id,
    * per-user histories are small), one map-side-combined count per
    * conversion, one keyed re-join, one map-side-combined sum per touch.
    */
  def linearAttribution(df: DataFrame, tsCol: String, userCol: String,
      typeCol: String, idCol: String, valueCol: String,
      touchType: String, convType: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0,
      s"windowSeconds must be positive, got $windowSeconds")
    require(touchType != convType,
      s"touch and conversion types must differ, got '$touchType'")
    val us = windowSeconds * 1000000L
    val touches = df.where(col(typeCol) === touchType)
      .select(col(userCol).as("__u"), col(idCol).as("touch_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("__t_us"))
    val convs = df.where(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("__conv_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("__c_us"),
        col(valueCol).cast("double").as("__v"))
    val pairs = touches.join(convs, Seq("__u"))
      .where(col("__t_us") <= col("__c_us")
        && col("__t_us") >= col("__c_us") - us)
    val nTouch = pairs.groupBy("__conv_id")
      .agg(count(lit(1)).as("__n"))
    pairs.join(nTouch, "__conv_id")
      .select(col("touch_id"),
        col("__conv_id"),
        floor(col("__v") * 1000000d / col("__n")).cast("long").as("__c_fp"))
      .groupBy("touch_id")
      .agg(count(lit(1)).as("n_conversions"),
        sum("__c_fp").as("credit_fp"))
      .select(col("touch_id"), col("n_conversions"), col("credit_fp"),
        (col("credit_fp").cast("double") / 1000000d).as("credit"))
  }

  /** Time-decay multi-touch attribution: like [[linearAttribution]] but
    * a conversion's `valueCol` splits across its in-window touches in
    * proportion to `2^(−age/halfLife)` — a touch `halfLife` seconds
    * before the conversion earns half the weight of one at the
    * conversion instant. The standard recency-weighted middle ground
    * between last-touch (halfLife → 0) and linear (halfLife → ∞).
    *
    * Determinism: the decay weight is `exp(−ln2 · age/halfLife)` with
    * ln2 PINNED to the literal 0.6931471805599453, quantized to
    * micro-weight longs (the [[kaplanMeier]] exp-quantization
    * convention) — the per-conversion weight total is then an EXACT long
    * sum, and each credit is floor(value · 1e6 · w_fp / Σw_fp) — one
    * fixed IEEE multiply-divide then exact floor, order-free like the
    * linear model's floor-div. A touch AT the conversion instant weighs
    * exactly 1e6; weights below 5e-7 of the conversion quantize to zero
    * credit (they were epsilon anyway).
    *
    * Shape at scale: identical to [[linearAttribution]] — one user-key
    * range join, one map-side-combined per-conversion weight sum, one
    * keyed re-join, one map-side-combined per-touch credit sum.
    */
  def timeDecayAttribution(df: DataFrame, tsCol: String, userCol: String,
      typeCol: String, idCol: String, valueCol: String,
      touchType: String, convType: String,
      windowSeconds: Long, halfLifeSeconds: Long): DataFrame = {
    require(windowSeconds > 0,
      s"windowSeconds must be positive, got $windowSeconds")
    require(halfLifeSeconds > 0,
      s"halfLifeSeconds must be positive, got $halfLifeSeconds")
    require(touchType != convType,
      s"touch and conversion types must differ, got '$touchType'")
    val us = windowSeconds * 1000000L
    val ln2 = 0.6931471805599453 // pinned: replay needs the exact literal
    val touches = df.where(col(typeCol) === touchType)
      .select(col(userCol).as("__u"), col(idCol).as("touch_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("__t_us"))
    val convs = df.where(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("__conv_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("__c_us"),
        col(valueCol).cast("double").as("__v"))
    val pairs = touches.join(convs, Seq("__u"))
      .where(col("__t_us") <= col("__c_us")
        && col("__t_us") >= col("__c_us") - us)
      .withColumn("__w_fp",
        round(exp(lit(-ln2) * ((col("__c_us") - col("__t_us"))
          .cast("double") / lit(halfLifeSeconds * 1000000L).cast("double")))
          * 1000000d).cast("long"))
    val wTotal = pairs.groupBy("__conv_id")
      .agg(sum("__w_fp").as("__wsum"))
    pairs.join(wTotal, "__conv_id")
      .where(col("__wsum") > 0L)
      .select(col("touch_id"), col("__conv_id"),
        floor(col("__v") * 1000000d * col("__w_fp").cast("double")
          / col("__wsum").cast("double")).cast("long").as("__c_fp"))
      .groupBy("touch_id")
      .agg(count(lit(1)).as("n_conversions"),
        sum("__c_fp").as("credit_fp"))
      .select(col("touch_id"), col("n_conversions"), col("credit_fp"),
        (col("credit_fp").cast("double") / 1000000d).as("credit"))
  }

  /** First-order Markov transition table: per user, events in (ts, id)
    * order yield (event_type -> next event_type) pairs; output is the
    * global pair count and the conditional probability
    * P(next | prev) = n / Σ_next n. The behavioral bigram model —
    * navigation structure, bot detection, session synthesis priors.
    *
    * Shape at scale: one window keyed on the user (each user's history
    * sorts independently — the per-stratum-window class, scale-safe when
    * users are numerous), then a map-side-combined pair count; the
    * row-count denominator rides a second small aggregation joined on
    * `prev_type` (bounded by the type vocabulary). The (ts, id) order is
    * total, so lag() is layout-deterministic.
    */
  /** Market-basket pair mining: support and lift of item pairs
    * co-occurring in a basket — the association-rule primitive (Agrawal
    * & Srikant 1994's frequent-pair stage; lift replaces confidence as
    * the symmetric interestingness score, the basket-world cousin of
    * [[TextAnalysis.pmiCollocations]]'s PMI). Output
    * (item_a, item_b, n_pairs, lift) for pairs in >= `minSupport`
    * baskets, item_a < item_b; lift = n_ab·N/(n_a·n_b) over DISTINCT
    * basket memberships, rounded 6dp.
    *
    * Scale shape: distinct (basket, item) first (map-side combined), the
    * pair self-join keys on the BASKET id — quadratic only within one
    * basket's item set (bounded by basket size, the co-occurrence-edges
    * plan class); item supports are a vocabulary-sized aggregate and the
    * basket total rides a one-row broadcast.
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 10): DataFrame = {
    val bi = graft.util.Caches.persist(
      df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct())
    val pairs = bi.as("x").join(bi.as("y"), "b")
      .where(col("x.i") < col("y.i"))
      .select(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minSupport)
    val supports = bi.groupBy("i").agg(count(lit(1)).as("n_i"))
    val nBaskets = bi.agg(countDistinct("b").as("n_baskets"))
    pairs
      .join(supports.select(col("i").as("item_a"), col("n_i").as("n_a")), "item_a")
      .join(supports.select(col("i").as("item_b"), col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pairs"),
        (round(col("n_pairs").cast("double") * col("n_baskets")
          / (col("n_a").cast("double") * col("n_b")), 6) + lit(0d)).as("lift"))
  }

  def transitions(df: DataFrame, tsCol: String, userCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(typeCol).as("next_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(sum("n").as("__tot"))
    pairs.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("__tot")).as("p"))
  }

  /** Top event PATHS: the `k` most frequent length-3 consecutive
    * event-type sequences across users (ties to the lexicographically
    * smallest path) — the order-3 extension of [[transitions]]'s Markov
    * pairs, the "what do users actually do" mining primitive.
    *
    * Shape at scale: one user-keyed window (two lags — same single
    * shuffle as transitions), a map-side-combined path count bounded by
    * |types|³, then TakeOrdered k.
    */
  def topPaths(df: DataFrame, tsCol: String, userCol: String,
      typeCol: String, idCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    df.select(col(typeCol).as("t3"),
        lag(col(typeCol), 1).over(w).as("t2"),
        lag(col(typeCol), 2).over(w).as("t1"))
      .where(col("t1").isNotNull)
      .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Deterministic per-key rate cap: keep at most `k` rows per
    * (`keyCol`, `bucketSeconds`-wide time bucket), earliest first, ties
    * on `idCol` — the ingestion throttle a crawl or event pipeline runs
    * so one hot user / agent / source cannot flood a training window
    * (and the fixed-cost cousin of per-stratum token caps: bound ROWS
    * per key-bucket, not tokens per stratum). Output is the surviving
    * rows with their bucket start and 1-based `slot`; the (ts, id)
    * order makes the kept set total-order deterministic under any
    * layout.
    *
    * Shape at scale: one window keyed (key, bucket) — partitions are
    * user×hour sized (small by construction; the cap exists precisely
    * because big ones are pathological), so the sort inside each is
    * bounded and the shuffle is the unavoidable one keyed by the cap's
    * own granularity. No global sort, no driver state.
    */
  def rateCap(df: DataFrame, tsCol: String, keyCol: String, idCol: String,
      bucketSeconds: Long, k: Int): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(k >= 1, s"k must be >= 1, got $k")
    // floor, not cast-truncation: pre-epoch timestamps divide negative
    val bucket = floor(unix_timestamp(col(tsCol)) / bucketSeconds)
      .cast("long")
    val w = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    df.withColumn("__bucket", bucket)
      .withColumn("slot", row_number().over(w).cast("long"))
      .where(col("slot") <= k)
      .withColumn("bucket_start",
        timestamp_seconds(col("__bucket") * bucketSeconds))
      .drop("__bucket")
  }

  /** Leading-edge DEBOUNCE: keep a row iff the same key's previous event
    * (by (ts, id) order) is at least `gapSeconds` older — duplicate-
    * submission suppression where any event, kept or not, re-arms the
    * timer. The first event of every key is always kept. Schema
    * unchanged.
    *
    * One lag window keyed on `keyCol` — a single key-partitioned shuffle,
    * no global sort. For the stricter "gap since last KEPT event"
    * semantics see [[throttle]].
    */
  def debounce(df: DataFrame, tsCol: String, keyCol: String, idCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    // cast: NTZ-inferred parquet timestamps reach unix_micros as UTC
    val t = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(t, 1).over(w)
    df.withColumn("__p", prev)
      .where(col("__p").isNull || t - col("__p") >= gapSeconds * 1000000L)
      .drop("__p")
  }

  /** THROTTLE: keep a row iff it is at least `gapSeconds` after the last
    * KEPT row of its key (first row per key always kept) — the
    * rate-limit/alert-suppression semantics where only emitted events
    * re-arm the timer. Unlike [[debounce]] this is inherently a
    * sequential per-key scan (each decision depends on the previous
    * DECISION, not the previous row), which no window function
    * expresses: this is the engine's designed last-resort tier — a
    * key-partitioned sort + one `mapPartitions` pass holding O(1) state
    * (current key, last kept timestamp). Output: (keyCol, tsCol as
    * micros, idCol) of kept rows.
    *
    * Deterministic: the scan order (key, ts, id) is total, so the kept
    * set is a pure function of the data under any layout.
    */
  def throttle(df: DataFrame, tsCol: String, keyCol: String, idCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val gapMicros = gapSeconds * 1000000L
    // key and id keep their NATIVE types (string user ids are the common
    // case) — the scan only needs key EQUALITY and the long timestamp,
    // so the rows pass through as Rows rather than a lossy cast("long")
    val proj = df.select(col(keyCol),
      unix_micros(col(tsCol).cast("timestamp")).as(tsCol), col(idCol))
    val enc = org.apache.spark.sql.Encoders.row(proj.schema)
    proj.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
      .mapPartitions { it =>
        var curKey: Any = null
        var haveKey = false
        var lastKept = Long.MinValue
        it.filter { r =>
          val k = r.get(0)
          val t = r.getLong(1)
          val newKey = !haveKey || k != curKey
          haveKey = true
          if (newKey) { curKey = k; lastKept = t; true }
          else if (t - lastKept >= gapMicros) { lastKept = t; true }
          else false
        }
      }(enc)
  }

  /** Kaplan–Meier survival curve (Kaplan & Meier 1958) over
    * right-censored durations — the time-to-churn / time-to-failure
    * readout a naive mean-lifetime cannot give, because units still
    * alive at the observation horizon carry information (they survived
    * AT LEAST this long) that dropping or treating them as events both
    * bias away.
    *
    * Input: one row per unit with a numeric `durationCol` and a boolean
    * `observedCol` (true = the event happened, false = censored at that
    * duration). Output: one row per distinct duration with
    * `(duration, n_risk, n_events, n_censored, survival)` where
    * `survival(t) = Π_{t_i <= t, d_i > 0} (n_i − d_i)/n_i`, ascending.
    *
    * Replay determinism: each factor enters as micro-nat-quantized
    * `ln((n−d)/n)` longs; the cumulative product is then an EXACT long
    * prefix sum, and only the final `exp(Σ/1e6)` rounds — the
    * [[Classify.naiveBayes]] fixed-point convention, so any engine
    * replays the curve bit-identically. A step that kills everyone
    * (d = n) zeroes the curve from that point on explicitly (ln 0 has no
    * fixed-point form).
    *
    * Shape at scale: per-duration event/censor tallies are one
    * map-side-combined aggregation; only the DISTINCT durations cross
    * the prefix-sum window. A survival curve is a presentation-sized
    * object — callers bucket durations first (the gate uses whole
    * hours), so the single-partition stretch is grid-bounded, the same
    * contract as [[TimeSeries]] grids.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      observedCol: String): DataFrame = {
    val steps = df
      .where(col(durationCol).isNotNull && col(observedCol).isNotNull)
      .groupBy(col(durationCol).cast("double").as("duration"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy("duration")
    // at risk at t = everyone whose duration is >= t: a suffix sum over
    // the distinct-duration grid
    val withRisk = steps
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(
          Window.orderBy("duration")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    // micro-nat step hazard; NULL marks the d = n annihilation step
    val stepLn = when(col("n_events") === 0, lit(0L))
      .otherwise(when(col("n_events") < col("n_risk"),
        round(log((col("n_risk") - col("n_events")).cast("double")
          / col("n_risk").cast("double")) * 1e6).cast("long")))
    withRisk
      .withColumn("__ln", stepLn)
      .withColumn("__dead",
        max(when(col("__ln").isNull, 1).otherwise(0)).over(w))
      .withColumn("__cum", sum(coalesce(col("__ln"), lit(0L))).over(w))
      .select(col("duration"), col("n_risk"), col("n_events"),
        col("n_censored"),
        when(col("__dead") === 1, lit(0d))
          .otherwise(round(exp(col("__cum").cast("double") / 1e6), 6)
            + lit(0d)).as("survival"))
  }
}

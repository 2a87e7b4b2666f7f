package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")

  test("gapfillHourly zero-fills missing hours over the global range") {
    val df = Seq(
      ("a", ts(0)), ("a", ts(0)), ("a", ts(3)), // a: hours 1, 2 missing
      ("b", ts(1))                              // b: 0, 2, 3 missing
    ).toDF("k", "t")
    val out = TimeSeries.gapfillHourly(df, "t", "k")
      .orderBy("k", "hour_start").collect()
    // dense grid: 2 keys x 4 hours (global range 00:00 .. 03:00)
    assert(out.length == 8)
    val a = out.filter(_.getString(0) == "a").map(_.getLong(2))
    val b = out.filter(_.getString(0) == "b").map(_.getLong(2))
    assert(a.toSeq == Seq(2L, 0L, 0L, 1L))
    assert(b.toSeq == Seq(0L, 1L, 0L, 0L))
  }

  test("gapfillHourly is a no-op on an already-dense series") {
    val df = (0 to 5).map(h => ("k", ts(h))).toDF("k", "t")
    val out = TimeSeries.gapfillHourly(df, "t", "k")
    assert(out.count() == 6)
    assert(out.where($"n_events" === 0).count() == 0)
  }

  test("gapfillHourly bounds broadcast; grid join needs no extra pass") {
    val df = Seq(("k", ts(0)), ("k", ts(2))).toDF("k", "t")
    val plan = TimeSeries.gapfillHourly(df, "t", "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"bounds must broadcast:\n$plan")
  }

  test("rolling: trailing range frame counts peers, sums exactly") {
    val df = Seq(
      (1L, 10L, ts(0), 1.5), (2L, 10L, ts(1), 2.5),
      (3L, 10L, ts(1), 4.0),                       // tie with event 2
      (4L, 10L, ts(5), 8.0),                       // outside 2h of the rest
      (5L, 20L, ts(1), 100.0)                      // other key
    ).toDF("event_id", "user_id", "t", "value")
    val out = TimeSeries.rolling(df, "t", "user_id", "value",
        windowSeconds = 2 * 3600)
      .select("event_id", "n_window", "sum_window")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (1L, 1.5))
    // RANGE frame: equal timestamps are peers — both see both
    assert(out(2L) == (3L, 8.0) && out(3L) == (3L, 8.0))
    assert(out(4L) == (1L, 8.0))                   // window slid past
    assert(out(5L) == (1L, 100.0))                 // keys independent
  }

  test("ewma: recurrence under (ts, id) order, reset per key, layout-stable") {
    val df = Seq(
      (1L, 10L, ts(0), 4.0), (2L, 10L, ts(1), 8.0), (3L, 10L, ts(2), 2.0),
      (4L, 20L, ts(0), 100.0)
    ).toDF("event_id", "user_id", "t", "value")
    val out = TimeSeries.ewma(df, "t", "user_id", "event_id", "value",
        alpha = 0.25)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(out(1L) == 4.0)                          // s1 = x1
    assert(out(2L) == 0.25 * 8.0 + 0.75 * 4.0)      // 5.0
    assert(out(3L) == 0.25 * 2.0 + 0.75 * 5.0)      // 4.25
    assert(out(4L) == 100.0, "state must reset per key")
    val again = TimeSeries.ewma(df.repartition(7), "t", "user_id",
      "event_id", "value", 0.25)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(again == out)
  }

  test("holt: level+trend recurrence, reset per key, layout-stable") {
    val df = Seq(
      (1L, 10L, ts(0), 4.0), (2L, 10L, ts(1), 8.0), (3L, 10L, ts(2), 12.0),
      (4L, 20L, ts(0), 100.0)
    ).toDF("event_id", "user_id", "t", "value")
    val out = TimeSeries.holt(df, "t", "user_id", "event_id", "value",
        alpha = 0.5, beta = 0.25)
      .select("event_id", "level", "trend", "forecast")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((4.0, 0.0, 4.0)))           // s1 = x1, b1 = 0
    // s2 = .5*8 + .5*(4+0) = 6; b2 = .25*(6-4) + .75*0 = 0.5
    assert(out(2L) == ((6.0, 0.5, 6.5)))
    // s3 = .5*12 + .5*6.5 = 9.25; b3 = .25*(9.25-6) + .75*.5 = 1.1875
    assert(out(3L) == ((9.25, 1.1875, 10.4375)))
    assert(out(4L) == ((100.0, 0.0, 100.0)), "state must reset per key")
    val again = TimeSeries.holt(df.repartition(7), "t", "user_id",
      "event_id", "value", 0.5, 0.25)
      .select("event_id", "level", "trend", "forecast")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(again == out)
  }

  test("holt tracks a pure linear trend (ewma would lag it)") {
    // x_t = 2t: after warm-up the one-step forecast converges onto the
    // next observation — the property that motivates the trend state
    val df = (1 to 30).map(i => (i.toLong, 1L, ts(0), 2.0 * i))
      .map { case (id, k, _, v) =>
        (id, k, new java.sql.Timestamp(id * 60000), v) }
      .toDF("event_id", "user_id", "t", "value")
    val rows = TimeSeries.holt(df, "t", "user_id", "event_id", "value",
        alpha = 0.5, beta = 0.25)
      .orderBy("event_id").select("forecast").as[Double].collect()
    val err = math.abs(rows(28) - 2.0 * 30) // forecast at t=29 vs x_30
    assert(err < 0.05, s"linear-trend forecast error $err")
  }

  test("cusum: integer recurrence, reset per key, alarm threshold") {
    val df = Seq(
      // key 10: values 5, 5, 20, 1 with target+slack = 10
      (1L, 10L, ts(0), 5.0), (2L, 10L, ts(1), 5.0),
      (3L, 10L, ts(2), 20.0), (4L, 10L, ts(3), 1.0),
      (5L, 20L, ts(0), 30.0)
    ).toDF("event_id", "user_id", "t", "value")
    val out = TimeSeries.cusum(df, "t", "user_id", "event_id", "value",
        target = 8.0, slack = 2.0, threshold = 9.0)
      .select("event_id", "s_fp", "alarm")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // s: max(0,5-10)=0; max(0,0+5-10)=0; max(0,0+20-10)=10; max(0,10+1-10)=1
    assert(out(1L) == (0L, false))
    assert(out(2L) == (0L, false))
    assert(out(3L) == (10000000L, true)) // 10 > 9 alarms
    assert(out(4L) == (1000000L, false))
    assert(out(5L) == (20000000L, true)) // key 20 resets: 30-10
  }

  test("cusum is layout-independent") {
    val rows = (1 to 300).map(i =>
      (i.toLong, (i % 5).toLong, ts(i % 60), (i % 23).toDouble))
    val df1 = rows.toDF("event_id", "user_id", "t", "value")
    val df2 = df1.repartition(7).sortWithinPartitions(desc("event_id"))
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.cusum(d, "t", "user_id", "event_id", "value",
        10.0, 1.0, 50.0).orderBy("event_id").collect().toSeq
    assert(run(df1) == run(df2))
  }

  test("intervalUtilization: clamped overlaps, multi-bucket spans, sums") {
    val bus = 3600L * 1000000L
    val df = Seq(
      // 30 min inside bucket 0
      (1L, 0L, 1800L * 1000000L),
      // spans buckets 1..3: 30 min + full hour + 1 us
      (2L, bus + 1800L * 1000000L, 3 * bus + 1L),
      // second interval for key 1 in bucket 0: sums with the first
      (1L, 600L * 1000000L, 1200L * 1000000L),
      // inverted interval: dropped
      (3L, 100L, 50L)
    ).toDF("k", "start_us", "end_us")
    val out = TimeSeries.intervalUtilization(df, "k", "start_us", "end_us",
        bucketSeconds = 3600)
      .orderBy("k", "bucket_start_us")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 0L, 1800L * 1000000L + 600L * 1000000L),
      (2L, bus, 1800L * 1000000L),
      (2L, 2 * bus, bus),
      (2L, 3 * bus, 1L)))
  }

  test("seasonalDeviation: each hour scored vs its OWN hour-of-day mean") {
    // two days; hour 0 has 4-then-1 events (spike then drop around a 2.5
    // mean), hour 1 steady at 2 — and hour 1's "2" must NOT be anomalous
    // even though hour 0's mean differs
    def t(day: Int, hourOfDay: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0${day + 1}%d 0$hourOfDay%d:0$i%d:00")
    val rows =
      (0 until 4).map(i => (t(0, 0, i), "a")) ++ Seq((t(1, 0, 0), "a")) ++
        (0 until 2).map(i => (t(0, 1, i), "a")) ++
        (0 until 2).map(i => (t(1, 1, i), "a"))
    val df = rows.toDF("ts", "event_type")
    val out = TimeSeries.seasonalDeviation(df, "ts", "event_type",
        lo = 0.5, hi = 1.5)
      .orderBy("hour_start")
      .as[(String, java.sql.Timestamp, Long, Long, Double, Double, Boolean)]
      .collect()
    // dense grid: day-1 hour 0 .. day-2 hour 1 = 26 hourly buckets
    assert(out.length == 26)
    val byHod = out.groupBy(_._3)
    // hour 0: counts (4, 1), mean 2.5 -> ratios 1.6 (spike) and 0.4 (drop)
    assert(byHod(0L).map(r => (r._4, r._6, r._7)).toSet ==
      Set((4L, 1.6, true), (1L, 0.4, true)))
    // hour 1: steady 2s, mean 2 -> ratio 1.0, never anomalous
    assert(byHod(1L).forall(r => r._6 == 1.0 && !r._7))
    // the 22 empty in-range hours have zero mean -> ratio 1.0, quiet
    assert(byHod.keySet.size == 24 || out.count(_._4 == 0L) == 22)
  }

  test("seasonalDeviationWeekly: 168-cell hour-of-week baseline with " +
      "the pinned Sunday-0 index; daily baseline would miss it") {
    // 2024-01-01 is a MONDAY: Mon 9am must index how = 1*24 + 9 = 33
    // (dow 0 = Sunday — Spark dayofweek − 1 == DuckDB dow).
    // Two Mondays 9am with counts 9 and 1: weekly mean 5 -> ratios
    // 1.8 / 0.2, the 0.2 anomalous at lo=0.25. Every OTHER grid cell
    // appears once in its weekly bucket -> ratio 1.0 (zero cells score
    // vs a zero mean), so the two Mondays are the only flags candidates.
    def t(day: Int, i: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-$day%02d 09:${i + 1}%02d:00")
    val rows = (0 until 9).map(i => (t(1, i), "a")) ++ Seq((t(8, 0), "a"))
    val out = TimeSeries.seasonalDeviationWeekly(
        rows.toDF("ts", "event_type"), "ts", "event_type",
        lo = 0.25, hi = 4.0)
      .orderBy("hour_start")
      .as[(String, java.sql.Timestamp, Long, Long, Double, Double, Boolean)]
      .collect()
    // grid: Mon-1 09:00 .. Mon-8 09:00 inclusive = 169 hourly cells
    assert(out.length == 169)
    val mondays = out.filter(_._3 == 33L)
    assert(mondays.length == 2)
    assert(mondays.map(r => (r._4, r._6, r._7)).toSet ==
      Set((9L, 1.8, false), (1L, 0.2, true)))
    // all non-Monday-9am cells: singleton weekly buckets, ratio 1.0
    assert(out.filter(_._3 != 33L).forall(r => r._6 == 1.0 && !r._7))
    // the DAILY baseline would pool Mon 9am with six other 9am's and
    // read a different mean — pin that the two profiles disagree here
    val daily = TimeSeries.seasonalDeviation(
        rows.toDF("ts", "event_type"), "ts", "event_type",
        lo = 0.25, hi = 4.0)
      .where(col("n_events") === 9L).select("ratio").collect().head
    assert(daily.getDouble(0) != 1.8)
  }

  test("seasonalAnomalyWeekly: flags the cell deviating from ITS " +
      "time-of-week norm, not the globally busy cells") {
    // three weeks of dense, mildly-varying base load (1..3 events every
    // hour — residual spread 1, so the MAD is nonzero), Mondays 9am
    // carrying a +60 rush (busy but NORMAL for the slot), and a fourth
    // Monday 9am at 50 — the seasonal break. The global-median chain
    // (events_anomaly's shape) reads every Monday rush as an outlier;
    // the weekly-residual chain must flag ONLY the broken one.
    def t(day: Int, hour: Int, i: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-$day%02d $hour%02d:${(i % 59) + 1}%02d:${i / 59}%02d")
    val base = for {
      d <- 1 to 21; h <- 0 until 24
      i <- 0 until (1 + (d + h) % 3)
    } yield (t(d, h, i), "a")
    val rush = Seq(1, 8, 15).flatMap(d =>
      (10 until 70).map(i => (t(d, 9, i), "a")))
    val broken = (0 until 50).map(i => (t(22, 9, i), "a"))
    val out = TimeSeries.seasonalAnomalyWeekly(
      (base ++ rush ++ broken).toDF("ts", "event_type"), "ts",
      "event_type", k = 3.5).collect()
    // Monday-9am slot: counts {62, 63, 61, 50}, mean 59 — the broken
    // week reads resid −9 against a corpus-wide residual MAD of ~1,
    // while the healthy rush weeks sit within ~3 of their slot mean
    assert(out.length >= 1)
    val flagged = out.map(_.getAs[Long]("n_events")).toSet
    assert(flagged.contains(50L),
      s"the broken Monday (count 50) must flag, got $flagged")
    assert(!flagged.exists(_ >= 60L),
      "healthy Monday rushes are NORMAL for their slot and must not " +
        s"flag, got $flagged")
    val b = out.find(_.getAs[Long]("n_events") == 50L).get
    assert(b.getAs[Long]("how") == 33L) // Monday 9am, Sunday-0 dow
    assert(b.getAs[Double]("resid") == 50.0 - 59.0)
    assert(b.getAs[Double]("robust_z") < -3.5)
    graft.util.Caches.unpersistAll()
  }

  test("rollingMedian: lower-middle discrete value, spike-robust, frame-bounded") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, 1L, t(1), 10.0), (2L, 1L, t(2), 12.0),
      (3L, 1L, t(3), 1000.0), // spike
      (4L, 1L, t(4), 11.0), (5L, 1L, t(5), 13.0),
      (6L, 2L, t(1), 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.rollingMedian(df, "ts", "user_id", "event_id",
      "value", k = 3)
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_frame"), r.getAs[Double]("rolling_median"))))
      .toMap
    assert(out(1L) == ((1L, 10.0)))
    assert(out(2L) == ((2L, 10.0)))   // lower-middle of {10, 12}
    assert(out(3L) == ((3L, 12.0)))   // spike ignored by the median
    assert(out(4L) == ((3L, 12.0)))   // {12, 1000, 11} -> 12
    assert(out(5L) == ((3L, 13.0)))   // {1000, 11, 13} -> 13
    assert(out(6L) == ((1L, 7.0)), "keys independent")
  }

  test("changepoint: hand-computed level shift") {
    // [1,1,1,5,5,5]: best split after ord 3; G = 3*3/6 * (5-1)^2 = 24
    val df = Seq((1, 1.0), (2, 1.0), (3, 1.0), (4, 5.0), (5, 5.0),
      (6, 5.0)).map { case (o, v) => ("k", o, v) }.toDF("key", "ord", "v")
    val r = TimeSeries.changepoint(df, "key", "ord", "v").collect().head
    assert(r.getAs[Int]("split_ord") == 3)
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Double]("mean_left") == 1.0)
    assert(r.getAs[Double]("mean_right") == 5.0)
    assert(r.getAs[Double]("score") == 24.0)
  }

  test("changepoint: constant series ties resolve to the earliest split") {
    val df = Seq(10, 20, 30, 40).map(o => ("k", o, 2.0))
      .toDF("key", "ord", "v")
    val r = TimeSeries.changepoint(df, "key", "ord", "v").collect().head
    assert(r.getAs[Int]("split_ord") == 10)
    assert(r.getAs[Double]("mean_left") == 2.0)
    assert(r.getAs[Double]("mean_right") == 2.0)
    assert(r.getAs[Double]("score") == 0.0)
  }

  test("changepoint: keys are independent; short series emit nothing") {
    val df = Seq(
      ("a", 1, 0.0), ("a", 2, 0.0), ("a", 3, 10.0),
      ("b", 1, 7.0), // single observation: no valid split
      ("c", 1, 3.0), ("c", 2, 9.0)).toDF("key", "ord", "v")
    val out = TimeSeries.changepoint(df, "key", "ord", "v")
      .orderBy("key").collect()
    assert(out.map(_.getAs[String]("key")).toSeq == Seq("a", "c"))
    assert(out.head.getAs[Int]("split_ord") == 2) // a: [0,0 | 10]
    assert(out.last.getAs[Double]("score") == 18.0) // c: 1*1/2*(9-3)^2
  }

  test("changepoint result is independent of input partitioning") {
    val df = spark.range(0, 600).select(
      (col("id") % 3).cast("string").as("key"),
      expr("id div 3").as("ord"),
      (when(expr("id div 3") < 120, col("id") % 7)
        .otherwise(col("id") % 7 + 50)).cast("double").as("v"))
    val base = TimeSeries.changepoint(df, "key", "ord", "v")
      .orderBy("key").collect()
    val again = TimeSeries.changepoint(df.repartition(13), "key", "ord", "v")
      .orderBy("key").collect()
    assert(again.map(_.toString).toSeq == base.map(_.toString).toSeq)
    assert(base.forall(_.getAs[Long]("split_ord") == 119L),
      "the planted shift is found in every key")
  }

  test("forecastEval: hand-checked metrics on one series") {
    val df = Seq((1, 10.0, 9.0), (2, 12.0, 13.0), (3, 9.0, 9.0),
      (4, 11.0, 10.0)).map { case (o, a, f) => ("k", o, a, f) }
      .toDF("key", "ord", "a", "f")
    val r = TimeSeries.forecastEval(df, "key", "ord", "a", "f")
      .collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mae") == 0.75) // (1+1+0+1)/4, dyadic-exact
    assert(r.getAs[Double]("rmse") == 0.866025) // sqrt(3/4)
    // mape = mean(1/10, 1/12, 0, 1/11); smape over the same rows;
    // naive denominators |12-10|,|9-12|,|11-9| -> mean 7/3
    assert(math.abs(r.getAs[Double]("mape") - 0.068561) < 2e-6)
    // mean(2/19, 2/25, 0, 2/21)
    assert(math.abs(r.getAs[Double]("smape") - 0.070125) < 2e-6)
    assert(math.abs(r.getAs[Double]("mase") - 0.75 / (7.0 / 3)) < 2e-6)
  }

  test("forecastEval: NULL marks not-measurable, never zero") {
    val df = Seq(("z", 1, 0.0, 0.0), ("z", 2, 0.0, 0.0),
      ("s", 1, 5.0, 4.0)).toDF("key", "ord", "a", "f")
    val out = TimeSeries.forecastEval(df, "key", "ord", "a", "f")
      .orderBy("key").collect()
    val s = out.head // single row: no naive diff -> mase NULL
    assert(s.getAs[String]("key") == "s" && s.getAs[Double]("mae") == 1.0)
    assert(s.isNullAt(s.fieldIndex("mase")))
    val z = out.last // all-zero rows: mape/smape/mase undefined
    assert(z.getAs[Double]("mae") == 0.0 && z.getAs[Double]("rmse") == 0.0)
    assert(z.isNullAt(z.fieldIndex("mape")))
    assert(z.isNullAt(z.fieldIndex("smape")))
    assert(z.isNullAt(z.fieldIndex("mase")))
  }

  test("forecastEval is independent of input partitioning") {
    val df = spark.range(0, 500).selectExpr(
      "CAST(id % 4 AS STRING) AS key", "id div 4 AS ord",
      "CAST(id % 17 AS DOUBLE) + 0.5 AS a",
      "CAST(id % 19 AS DOUBLE) AS f")
    val base = TimeSeries.forecastEval(df, "key", "ord", "a", "f")
      .orderBy("key").collect()
    val again = TimeSeries
      .forecastEval(df.repartition(11), "key", "ord", "a", "f")
      .orderBy("key").collect()
    assert(base.length == 4)
    assert(again.map(_.toString).toSeq == base.map(_.toString).toSeq)
  }

  test("theilSen: median pairwise slope resists the outlier hour that " +
      "would drag OLS") {
    // hourly counts 1, 2, 3, 10 — pairwise slopes 1,1,1,3,4,7;
    // median = (1+3)/2 = 2 (OLS slope would be ~2.8)
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 3, 3 -> 10)
      .flatMap { case (h, c) => Seq.fill(c)(("k", ts(h))) }
    val r = TimeSeries.theilSen(rows.toDF("k", "t"), "t", "k")
      .collect().head
    assert(r.getAs[Long]("n_hours") == 4L
      && r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("slope") == 2.0, r.toString)
    graft.util.Caches.unpersistAll()
  }

  test("mannKendall: strictly rising series matches the brute z; flat " +
      "series scores S = 0, z = 0") {
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 3, 3 -> 4)
      .flatMap { case (h, c) => Seq.fill(c)(("k", ts(h))) }
    val r = TimeSeries.mannKendall(rows.toDF("k", "t"), "t", "k")
      .collect().head
    assert(r.getAs[Long]("s") == 6L, r.toString)
    val varS = 4.0 * 3 * 13 / 18.0 // no ties
    assert(math.abs(r.getAs[Double]("var_s") - varS) < 1e-6)
    val zRef = BigDecimal((6.0 - 1) / math.sqrt(varS))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == zRef, r.toString)
    // constant series: every pair ties -> S = 0 and Var = 0 -> z = 0
    val flat = (0 to 3).flatMap(h => Seq.fill(2)(("k", ts(h))))
    val f = TimeSeries.mannKendall(flat.toDF("k", "t"), "t", "k")
      .collect().head
    assert(f.getAs[Long]("s") == 0L && f.getAs[Double]("z") == 0.0)
    graft.util.Caches.unpersistAll()
  }

  test("acf matches a brute reference, flags period-2 alternation with " +
      "r1 < 0 < r2, constant series is NULL, layout-invariant") {
    // alternating 3,1,3,1,... hourly counts: event h gets (3 if even)
    val rows = (0 until 12).flatMap { h =>
      val n = if (h % 2 == 0) 3 else 1
      Seq.fill(n)(("k", ts(h)))
    }
    val df = rows.toDF("k", "t")
    val out = TimeSeries.acf(df, "t", "k", maxLag = 3)
      .orderBy("lag").collect()
    val series = (0 until 12).map(h => if (h % 2 == 0) 3.0 else 1.0)
    val m = series.sum / series.size
    def brute(k: Int): Double = {
      val num = (0 until 12 - k)
        .map(t => (series(t) - m) * (series(t + k) - m)).sum
      val den = series.map(x => (x - m) * (x - m)).sum
      num / den
    }
    out.zip(1 to 3).foreach { case (r, k) =>
      assert(r.getAs[Long]("n_pairs") == 12L - k)
      assert(math.abs(r.getAs[Double]("acf") - brute(k)) < 1e-6,
        s"lag $k: ${r.getAs[Double]("acf")} vs brute ${brute(k)}")
    }
    assert(out(0).getAs[Double]("acf") < 0 && out(1).getAs[Double]("acf") > 0,
      "period-2 alternation: r1 negative, r2 positive")
    // constant series: zero variance -> NULL by convention
    val const = (0 until 6).map(h => ("k", ts(h))).toDF("k", "t")
    val c = TimeSeries.acf(const, "t", "k", maxLag = 2).collect()
    assert(c.forall(_.isNullAt(3)), "constant series must emit NULL acf")
    val rep = TimeSeries.acf(df.repartition(7), "t", "k", maxLag = 3)
      .orderBy("lag").collect()
    assert(rep.map(_.toString).toSeq == out.map(_.toString).toSeq)
    graft.util.Caches.unpersistAll()
  }

  test("dtwBanded kernel: hand-verified DP value, zero on identical " +
      "series, null outside the band") {
    val V = graft.functions.VectorFunctions
    // reference value computed by the full O(nm) textbook DP (band 3)
    val df = Seq((
      Array(1.0, 3.0, 4.0, 9.0, 8.0, 2.0, 1.0, 5.0, 7.0),
      Array(1.0, 6.0, 2.0, 3.0, 0.0, 9.0, 4.0, 3.0, 6.0)
    )).toDF("a", "b")
    val r = df.select(
      V.dtwBanded(col("a"), col("b"), 3).as("d"),
      V.dtwBanded(col("a"), col("a"), 0).as("self"),
      V.dtwBanded(col("a"), col("b"), 9).as("full")).collect().head
    assert(r.getDouble(0) == 15.0, r.toString)
    assert(r.getDouble(1) == 0.0)
    // widening the band can only help (more cells reachable)
    assert(r.getDouble(2) <= 15.0)
    // |n - m| > band: no warping path -> null, never a garbage number
    val mm = Seq((Array(1.0, 2.0, 3.0, 4.0, 5.0), Array(1.0)))
      .toDF("a", "b")
      .select(V.dtwBanded(col("a"), col("b"), 2)).collect().head
    assert(mm.isNullAt(0))
  }

  test("dtw: a time-shifted copy reads closer than a different shape; " +
      "layout bit-invariant") {
    // key a: a spike at hours 2-3; key b: the same spike at hours 4-5
    // (shifted by 2, inside the band); key c: flat-ish different shape.
    def burst(k: String, h: Int, n: Int) =
      (0 until n).map(_ => (k, ts(h)))
    val df = (
      burst("a", 2, 5) ++ burst("a", 3, 5) ++ burst("a", 0, 1) ++
        burst("a", 7, 1) ++
      burst("b", 4, 5) ++ burst("b", 5, 5) ++ burst("b", 0, 1) ++
        burst("b", 7, 1) ++
      burst("c", 0, 2) ++ burst("c", 1, 2) ++ burst("c", 2, 2) ++
        burst("c", 3, 2) ++ burst("c", 4, 2) ++ burst("c", 5, 2) ++
        burst("c", 6, 2) ++ burst("c", 7, 2)
    ).toDF("k", "t")
    val out = TimeSeries.dtw(df, "t", "k", band = 3)
      .orderBy("key_a", "key_b").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // the shifted twin aligns almost perfectly; the flat series cannot
    assert(out(("a", "b")) < out(("a", "c")), out.toString)
    assert(out(("a", "b")) < out(("b", "c")), out.toString)
    val rp = TimeSeries.dtw(df.repartition(7), "t", "k", band = 3)
      .orderBy("key_a", "key_b").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(rp == out)
    intercept[IllegalArgumentException] {
      TimeSeries.dtw(df, "t", "k", band = 3, maxLen = 4)
    }
    graft.util.Caches.unpersistAll()
  }
}

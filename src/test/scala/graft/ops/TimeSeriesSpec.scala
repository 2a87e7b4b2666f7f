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
}

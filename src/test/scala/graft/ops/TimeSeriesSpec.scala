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
}

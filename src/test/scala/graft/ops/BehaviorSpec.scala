package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-05 10:$m%02d:00")

  test("funnel: strictly-after chaining, per-step reach and ratios") {
    val df = Seq(
      // u1 completes view -> click -> buy in order
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(1)),
      (3L, 1L, "buy", ts(2)),
      // u2 clicks BEFORE its first view: click must not count
      (4L, 2L, "click", ts(0)), (5L, 2L, "view", ts(1)),
      // u3 view + click, no buy
      (6L, 3L, "view", ts(0)), (7L, 3L, "click", ts(5)),
      // u4 never views: invisible to the funnel
      (8L, 4L, "buy", ts(0))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.funnel(df, "t", "user_id", "event_type",
        Seq("view", "click", "buy"))
      .orderBy("step_idx")
      .as[(Int, String, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L)))
    assert(out(0)._4 == 1.0 && out(0)._5 == 1.0)
    assert(out(1)._4 == 2.0 / 3 && out(1)._5 == 2.0 / 3)
    assert(out(2)._4 == 1.0 / 2 && out(2)._5 == 1.0 / 3)
  }

  test("funnel: equal timestamp does NOT advance (strict >)") {
    val df = Seq(
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(0)), // same instant
      (3L, 2L, "view", ts(0)), (4L, 2L, "click", ts(1))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.funnel(df, "t", "user_id", "event_type",
        Seq("view", "click"))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(out.toSeq == Seq(2L, 1L))
  }

  test("funnel: later qualifying event still counts after a too-early one") {
    // u1's first click precedes the view, but a SECOND click follows it —
    // min-after-reach semantics must pick that one up
    val df = Seq(
      (1L, 1L, "click", ts(0)), (2L, 1L, "view", ts(1)),
      (3L, 1L, "click", ts(2))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.funnel(df, "t", "user_id", "event_type",
        Seq("view", "click"))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L))
  }

  test("funnel with deadline: step outside maxGap does not count") {
    val df = Seq(
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(5)),   // within 10 min
      (3L, 2L, "view", ts(0)), (4L, 2L, "click", ts(30))   // 30 min > gap
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.funnel(df, "t", "user_id", "event_type",
        Seq("view", "click"), maxGapSeconds = Some(600L))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(out.toSeq == Seq(2L, 1L))
    // boundary: exactly at the deadline still counts (<=)
    val edge = Seq(
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(10))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out2 = Behavior.funnel(edge, "t", "user_id", "event_type",
        Seq("view", "click"), maxGapSeconds = Some(600L))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(out2.toSeq == Seq(1L, 1L))
  }

  test("linearAttribution: equal split in exact micro-units") {
    val df = Seq(
      // user 1: two clicks inside the window of one 10.01 purchase
      (1L, 1L, "click", ts(0), 0.0), (2L, 1L, "click", ts(10), 0.0),
      (3L, 1L, "purchase", ts(20), 10.01),
      // click at the conversion instant counts; click after does not
      (4L, 2L, "click", ts(30), 0.0), (5L, 2L, "purchase", ts(30), 6.0),
      (6L, 2L, "click", ts(31), 0.0),
      // purchase with NO in-window touch: unattributed, drops out
      (7L, 3L, "purchase", ts(0), 99.0)
    ).toDF("event_id", "user_id", "event_type", "t", "value")
    val out = Behavior.linearAttribution(df, "t", "user_id", "event_type",
        "event_id", "value", "click", "purchase", windowSeconds = 1800)
      .orderBy("touch_id")
      .as[(Long, Long, Long, Double)].collect()
    // 10.01 * 1e6 / 2 = 5005000 micro-units each (floor exact)
    assert(out.toSeq == Seq(
      (1L, 1L, 5005000L, 5.005), (2L, 1L, 5005000L, 5.005),
      (4L, 1L, 6000000L, 6.0)))
  }

  test("linearAttribution: a touch accumulates over multiple conversions") {
    val df = Seq(
      (1L, 1L, "click", ts(0), 0.0),
      (2L, 1L, "purchase", ts(1), 3.0),
      (3L, 1L, "purchase", ts(2), 5.0)
    ).toDF("event_id", "user_id", "event_type", "t", "value")
    val out = Behavior.linearAttribution(df, "t", "user_id", "event_type",
        "event_id", "value", "click", "purchase", windowSeconds = 1800)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 8000000L, 8.0)))
  }

  test("funnel: a step nobody reaches still emits a zero row") {
    val df = Seq(
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(1))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.funnel(df, "t", "user_id", "event_type",
        Seq("view", "click", "buy"))
      .orderBy("step_idx")
      .as[(Int, String, Long, Double, Double)].collect()
    assert(out.length == 3)
    assert(out(2) == ((3, "buy", 0L, 0.0, 0.0)))
  }

  test("funnel rejects degenerate step lists") {
    val df = Seq((1L, 1L, "view", ts(0))).toDF("event_id", "user_id",
      "event_type", "t")
    intercept[IllegalArgumentException] {
      Behavior.funnel(df, "t", "user_id", "event_type", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Behavior.funnel(df, "t", "user_id", "event_type",
        Seq("view", "view"))
    }
  }

  test("cohortRetention: Monday cohort weeks, exact week offsets") {
    def d(s: String) = java.sql.Timestamp.valueOf(s"$s 12:00:00")
    val df = Seq(
      (1L, d("2026-01-05")), // u1 cohort week = Mon 2026-01-05
      (1L, d("2026-01-11")), // Sunday, SAME week -> offset 0
      (1L, d("2026-01-12")), // next Monday -> offset 1
      (1L, d("2026-01-26")), // offset 3
      (2L, d("2026-01-13")), // u2 cohort week = Mon 2026-01-12
      (2L, d("2026-01-19"))  // offset 1
    ).toDF("user_id", "t")
    val out = Behavior.cohortRetention(df, "t", "user_id")
      .orderBy("cohort_week", "week_offset")
      .as[(java.sql.Date, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (java.sql.Date.valueOf("2026-01-05"), 0L, 1L),
      (java.sql.Date.valueOf("2026-01-05"), 1L, 1L),
      (java.sql.Date.valueOf("2026-01-05"), 3L, 1L),
      (java.sql.Date.valueOf("2026-01-12"), 0L, 1L),
      (java.sql.Date.valueOf("2026-01-12"), 1L, 1L)))
  }

  test("cohortRetention counts distinct users per cell") {
    def d(s: String) = java.sql.Timestamp.valueOf(s"$s 12:00:00")
    val df = Seq(
      (1L, d("2026-01-05")), (1L, d("2026-01-06")), // two events, one user
      (2L, d("2026-01-07"))
    ).toDF("user_id", "t")
    val out = Behavior.cohortRetention(df, "t", "user_id").collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 2L) // cell (2026-01-05, 0): users 1 and 2
  }

  test("transitions: lag pairs under (ts, id) order, row probabilities") {
    val df = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(1)), (3L, 1L, "a", ts(2)),
      (4L, 1L, "b", ts(3)),
      (5L, 2L, "a", ts(0)), (6L, 2L, "c", ts(1))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.transitions(df, "t", "user_id", "event_type",
        "event_id")
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect()
    // a->b x2, a->c x1, b->a x1
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 2.0 / 3), ("a", "c", 1L, 1.0 / 3),
      ("b", "a", 1L, 1.0)))
  }

  test("transitions: equal-timestamp ties break on the id column") {
    val df = Seq(
      (2L, 1L, "b", ts(0)), (1L, 1L, "a", ts(0)), (3L, 1L, "c", ts(1))
    ).toDF("event_id", "user_id", "event_type", "t")
    val out = Behavior.transitions(df, "t", "user_id", "event_type",
        "event_id")
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq == Seq("a" -> "b", "b" -> "c"))
  }

  test("transitions are layout-independent") {
    val rows = (1 to 200).map { i =>
      (i.toLong, (i % 7).toLong, Seq("a", "b", "c")(i % 3), ts(i % 60))
    }
    val df1 = rows.toDF("event_id", "user_id", "event_type", "t")
    val df2 = df1.repartition(7).sortWithinPartitions(desc("event_id"))
    val a = Behavior.transitions(df1, "t", "user_id", "event_type",
      "event_id").orderBy("prev_type", "next_type").collect().toSeq
    val b = Behavior.transitions(df2, "t", "user_id", "event_type",
      "event_id").orderBy("prev_type", "next_type").collect().toSeq
    assert(a == b)
  }

  test("basketPairs: distinct membership, exact support, lift above/below 1") {
    // baskets: {a,b} x3, {a,c}, {b,c}, {c,d} — a/b co-occur far above
    // independence, b/c exactly at chance-ish, duplicates inside one
    // basket count once
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"), // duplicate membership: counts once
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "c"),
      (5L, "b"), (5L, "c"),
      (6L, "c"), (6L, "d")
    ).toDF("basket", "item")
    val out = Behavior.basketPairs(df, "basket", "item", minSupport = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // n_ab = 3 of 6 baskets; n_a = 4, n_b = 4 -> lift = 3*6/16 = 1.125
    assert(out(("a", "b")) == (3L, 1.125))
    // n_cd = 1; n_c = 3, n_d = 1 -> lift = 1*6/3 = 2.0
    assert(out(("c", "d")) == (1L, 2.0))
    assert(!out.contains(("b", "a")), "pairs are canonical item_a < item_b")
    // support floor prunes
    val floored = Behavior.basketPairs(df, "basket", "item", minSupport = 2)
      .as[(String, String, Long, Double)].collect()
    assert(floored.map(r => (r._1, r._2)).toSet == Set(("a", "b")))
    graft.util.Caches.unpersistAll()
  }

  test("rateCap: first k per key-bucket by (ts, id), bucket boundaries") {
    val df = Seq(
      // user 1, hour 0: four events -> slot 4 dropped at k=3
      (1L, 1L, "2024-01-01 00:00:01"), (2L, 1L, "2024-01-01 00:10:00"),
      (3L, 1L, "2024-01-01 00:20:00"), (4L, 1L, "2024-01-01 00:59:59"),
      // user 1, hour 1: fresh budget
      (5L, 1L, "2024-01-01 01:00:00"),
      // user 2, hour 0: under cap
      (6L, 2L, "2024-01-01 00:30:00")
    ).toDF("event_id", "user_id", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val out = Behavior.rateCap(df, "ts", "user_id", "event_id",
      bucketSeconds = 3600L, k = 3)
    val kept = out.select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L, 6L))
    val slots = out.select("event_id", "slot").as[(Long, Long)]
      .collect().toMap
    assert(slots(1L) == 1L && slots(3L) == 3L && slots(5L) == 1L)
    val b5 = out.where($"event_id" === 5L)
      .select(col("bucket_start").cast("string")).as[String].collect().head
    assert(b5 == "2024-01-01 01:00:00")
  }

  test("rateCap: equal timestamps tie-break on id deterministically") {
    val df = Seq((9L, 1L), (7L, 1L), (8L, 1L))
      .toDF("event_id", "user_id")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val out = Behavior.rateCap(df, "ts", "user_id", "event_id",
        bucketSeconds = 3600L, k = 2)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(7L, 8L))
  }

  test("topPaths: hand-computed trigram paths across users") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, 1L, t(1), "view"), (2L, 1L, t(2), "click"),
      (3L, 1L, t(3), "purchase"), (4L, 1L, t(4), "view"),
      (5L, 2L, t(1), "view"), (6L, 2L, t(2), "click"),
      (7L, 2L, t(3), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Behavior.topPaths(df, "ts", "user_id", "event_type",
      "event_id", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("view>click>purchase") == 2L)
    assert(out("click>purchase>view") == 1L)
    assert(out.size == 2, "user boundaries never spliced")
  }

  private def tsl(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("debounce vs throttle: the t=0, 0.5g, 1.1g distinction") {
    // gap 100s; events at 0, 50, 110 for one user
    val df = Seq((1L, 100L, tsl(0)), (2L, 100L, tsl(50)),
      (3L, 100L, tsl(110))).toDF("event_id", "user_id", "ts")
    val deb = Behavior.debounce(df, "ts", "user_id", "event_id", 100L)
      .select("event_id").as[Long].collect().toSet
    // debounce: 50 re-arms the timer, so 110 (60s after 50) is dropped
    assert(deb == Set(1L))
    val thr = Behavior.throttle(df, "ts", "user_id", "event_id", 100L)
      .select("event_id").as[Long].collect().toSet
    // throttle: only KEPT events re-arm -> 110 is 110s after kept 0
    assert(thr == Set(1L, 3L))
  }

  test("throttle: per-key independence, first always kept") {
    val df = Seq((1L, 1L, tsl(0)), (2L, 1L, tsl(10)), (3L, 1L, tsl(20)),
      (4L, 2L, tsl(5))).toDF("event_id", "user_id", "ts")
    val out = Behavior.throttle(df, "ts", "user_id", "event_id", 15L)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L))
  }

  test("throttle matches a reference greedy scan and any layout") {
    val rows = (1L to 300L).map(i =>
      (i, i % 7, tsl((i * 37) % 500)))
    val df = rows.toDF("event_id", "user_id", "ts")
    def reference(gap: Long): Set[Long] = rows
      .groupBy(_._2).flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._3.getTime, e._1))
        var last = Long.MinValue
        sorted.flatMap { case (id, _, t) =>
          val tm = t.getTime
          if (last == Long.MinValue || tm - last >= gap * 1000L) {
            last = tm; Some(id)
          } else None
        }
      }.toSet
    val got = Behavior.throttle(df, "ts", "user_id", "event_id", 60L)
      .select("event_id").as[Long].collect().toSet
    assert(got == reference(60L))
    val got13 = Behavior.throttle(df.repartition(13), "ts", "user_id",
      "event_id", 60L).select("event_id").as[Long].collect().toSet
    assert(got13 == got, "layout independence")
  }

  test("debounce keeps schema and pushes no global sort") {
    val df = Seq((1L, 1L, tsl(0), "x")).toDF("event_id", "user_id", "ts", "p")
    val out = Behavior.debounce(df, "ts", "user_id", "event_id", 10L)
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "p"))
    assert(!out.queryExecution.executedPlan.toString
      .contains("rangepartitioning"), "window must be key-partitioned")
  }

  test("kaplanMeier: hand-computed curve, censoring, annihilation, layout") {
    // classic textbook fixture:
    //   t=1 death (n=6) -> 5/6; t=2 death+censor (n=5) -> *4/5 = 2/3
    //   t=3 death (n=3)        -> *2/3 = 4/9
    //   t=4 censor only        -> unchanged
    //   t=5 death, d = n = 1   -> curve hits exactly 0
    val units = Seq((1.0, true), (2.0, true), (2.0, false), (3.0, true),
      (4.0, false), (5.0, true)).toDF("dur", "obs")
    val r = Behavior.kaplanMeier(units, "dur", "obs")
      .orderBy("duration").collect()
    assert(r.map(x => (x.getDouble(0), x.getLong(1), x.getLong(2),
      x.getLong(3))).toSeq == Seq(
      (1.0, 6L, 1L, 0L), (2.0, 5L, 1L, 1L), (3.0, 3L, 1L, 0L),
      (4.0, 2L, 0L, 1L), (5.0, 1L, 1L, 0L)))
    val s = r.map(_.getDouble(4))
    assert(math.abs(s(0) - 5.0 / 6) < 1e-4)
    assert(math.abs(s(1) - 2.0 / 3) < 1e-4)
    assert(math.abs(s(2) - 4.0 / 9) < 1e-4)
    assert(s(3) == s(2), "censor-only step leaves survival unchanged")
    assert(s(4) == 0.0, "d = n annihilates the curve exactly")
    // all censored: flat 1.0 curve (micro-nat sum stays 0)
    val flat = Behavior.kaplanMeier(
      Seq((1.0, false), (2.0, false)).toDF("dur", "obs"), "dur", "obs")
      .orderBy("duration").collect()
    assert(flat.forall(_.getDouble(4) == 1.0))
    // pure function of the (duration, observed) multiset
    val again = Behavior.kaplanMeier(units.repartition(7), "dur", "obs")
      .orderBy("duration").collect()
    assert(again.map(_.toString).toSeq == r.map(_.toString).toSeq)
  }

  test("timeDecayAttribution: hand-computed half-life split") {
    val df = Seq(
      // touch at the conversion instant: weight exactly 1e6; a touch one
      // half-life (10 min) earlier: weight 5e5 -> credits split 2:1
      (1L, 1L, "click", ts(0), 0.0), (2L, 1L, "click", ts(10), 0.0),
      (3L, 1L, "purchase", ts(10), 3.0)
    ).toDF("event_id", "user_id", "event_type", "t", "value")
    val out = Behavior.timeDecayAttribution(df, "t", "user_id",
        "event_type", "event_id", "value", "click", "purchase",
        windowSeconds = 1800, halfLifeSeconds = 600)
      .orderBy("touch_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1L, 1000000L, 1.0),
      (2L, 1L, 2000000L, 2.0)))
  }

  test("timeDecayAttribution: huge half-life degenerates to linear") {
    val df = Seq(
      (1L, 1L, "click", ts(0), 0.0), (2L, 1L, "click", ts(11), 0.0),
      (3L, 1L, "purchase", ts(15), 10.01),
      (4L, 2L, "click", ts(30), 0.0), (5L, 2L, "purchase", ts(35), 6.0),
      (6L, 2L, "purchase", ts(40), 5.0)
    ).toDF("event_id", "user_id", "event_type", "t", "value")
    val lin = Behavior.linearAttribution(df, "t", "user_id", "event_type",
        "event_id", "value", "click", "purchase", windowSeconds = 1800)
      .orderBy("touch_id").collect()
    // a 10^12-second half-life rounds every in-window weight to 1e6
    val dec = Behavior.timeDecayAttribution(df, "t", "user_id",
        "event_type", "event_id", "value", "click", "purchase",
        windowSeconds = 1800, halfLifeSeconds = 1000000000000L)
      .orderBy("touch_id").collect()
    assert(dec.map(_.toString).toSeq == lin.map(_.toString).toSeq)
  }

  test("timeDecayAttribution is layout-independent") {
    val df = spark.range(0, 300).selectExpr("id AS event_id",
      "id % 20 AS user_id",
      "CASE WHEN id % 7 = 0 THEN 'purchase' ELSE 'click' END AS event_type",
      "timestamp_micros(1700000000000000 + id * 7000000) AS t",
      "CAST(id % 13 AS DOUBLE) + 0.25 AS value")
    val base = Behavior.timeDecayAttribution(df, "t", "user_id",
        "event_type", "event_id", "value", "click", "purchase",
        windowSeconds = 600, halfLifeSeconds = 120)
      .orderBy("touch_id").collect()
    val again = Behavior.timeDecayAttribution(df.repartition(13), "t",
        "user_id", "event_type", "event_id", "value", "click", "purchase",
        windowSeconds = 600, halfLifeSeconds = 120)
      .orderBy("touch_id").collect()
    assert(base.nonEmpty)
    assert(again.map(_.toString).toSeq == base.map(_.toString).toSeq)
  }
}

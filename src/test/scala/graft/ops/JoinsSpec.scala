package graft.ops

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L), // before any right row -> null match
    (2L, "u1", 200L), // exactly at a right ts -> inclusive match
    (3L, "u1", 350L), // between rights -> the earlier one
    (4L, "u2", 500L)  // key with no right rows at all
  ).toDF("event_id", "user", "t")

  private def right = Seq(
    ("u1", 200L, "a"),
    ("u1", 300L, "b")
  ).toDF("user", "rt", "tag")

  test("asof picks the latest right row at or before each left row") {
    val out = Joins.asof(left, right, Seq("user"), "t", "rt")
      .select($"event_id", $"tag").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> None, 2L -> Some("a"), 3L -> Some("b"), 4L -> None))
  }

  test("asof output keeps left columns and appends right payload") {
    val out = Joins.asof(left, right, Seq("user"), "t", "rt")
    assert(out.columns.toSeq == Seq("event_id", "user", "t", "rt", "tag"))
    assert(out.count() == left.count()) // exactly one output row per left row
  }

  test("asof forward picks the earliest right row at or after each left row") {
    val out = Joins.asof(left, right, Seq("user"), "t", "rt", forward = true)
      .select($"event_id", $"tag").as[(Long, Option[String])]
      .collect().toMap
    // 1 (t=100) -> next right at 200 = a; 2 (t=200) -> inclusive a;
    // 3 (t=350) -> nothing after; 4 (u2) -> no rights at all
    assert(out == Map(1L -> Some("a"), 2L -> Some("a"), 3L -> None, 4L -> None))
  }

  test("asof tie on (key, time): the max payload struct wins deterministically") {
    val dupRight = Seq(("u1", 200L, "a"), ("u1", 200L, "z")).toDF("user", "rt", "tag")
    val out = Joins.asof(left.where($"event_id" === 2L), dupRight, Seq("user"), "t", "rt")
      .select($"tag").as[String].collect()
    assert(out.toSeq == Seq("z"))
  }

  test("asofNearest picks the closest right row, ties backward") {
    val out = Joins.asofNearest(left, right, Seq("user"), "t", "rt")
      .select($"event_id", $"tag").as[(Long, Option[String])]
      .collect().toMap
    // 1 (t=100): nearest is rt=200 (d=100) forward; 2 (t=200): exact;
    // 3 (t=350): rt=300 (d=50) beats rt=200 (d=150); 4: no rights
    assert(out == Map(1L -> Some("a"), 2L -> Some("a"), 3L -> Some("b"),
      4L -> None))
  }

  test("asofNearest: equidistant neighbors resolve to the backward row") {
    val mid = Seq((9L, "u1", 250L)).toDF("event_id", "user", "t")
    val out = Joins.asofNearest(mid, right, Seq("user"), "t", "rt")
      .select($"tag").as[String].collect()
    assert(out.toSeq == Seq("a"), "t=250 is 50 from both; backward wins")
  }

  test("asofNearest tolerance drops matches farther than the bound") {
    val out = Joins.asofNearest(left, right, Seq("user"), "t", "rt",
        toleranceMicros = 60L)
      .select($"event_id", $"tag").as[(Long, Option[String])]
      .collect().toMap
    // 1 (d=100 > 60) -> null; 2 (d=0) -> a; 3 (d=50) -> b; 4 -> null
    assert(out == Map(1L -> None, 2L -> Some("a"), 3L -> Some("b"),
      4L -> None))
  }

  test("asofNearest shares one exchange across both direction sorts") {
    val plan = Joins.asofNearest(left, right, Seq("user"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), "nearest as-of must not plan a cartesian")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"expected one key shuffle reused by both windows, got $shuffles:\n$plan")
  }

  test("asof plans one shuffle + window, never a per-key cartesian") {
    val plan = Joins.asof(left, right, Seq("user"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"cartesian in asof plan:\n$plan")
    assert(plan.contains("Window"), s"expected window plan:\n$plan")
    // one exchange for the union'd key shuffle; no join node at all
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"unexpected join node (union+window form has none):\n$plan")
  }

  test("asof rejects colliding right payload names") {
    intercept[IllegalArgumentException] {
      Joins.asof(left, right.withColumnRenamed("tag", "t"), Seq("user"), "t", "rt")
    }
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def points = Seq(
    (1L, "u1", ts("2024-01-01 10:00:30")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 10:00:30"))
  ).toDF("event_id", "user", "t")

  private def intervals = Seq(
    ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00"), "w1"),
    ("u1", ts("2024-01-01 10:00:30"), ts("2024-01-01 10:00:30"), "w2"), // point interval, inclusive both ends
    ("u2", ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00"), "bad") // inverted: dropped
  ).toDF("user", "s", "e", "w")

  test("range join pairs each point with every containing interval, inclusive bounds") {
    val out = Joins.range(points, "t", intervals, "s", "e", Seq("user"),
        bucketSeconds = 1800)
      .select($"event_id", $"w").as[(Long, String)].collect().toSet
    // event 1 in w1 and the point-interval w2; event 2 after w1 ends;
    // event 3's only candidate interval is inverted
    assert(out == Set((1L, "w1"), (1L, "w2")))
  }

  test("range join emits each (point, interval) pair exactly once across buckets") {
    // interval spans 4 buckets at 30min granularity; the point matches once
    val wide = Seq(("u1", ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"), "wide"))
      .toDF("user", "s", "e", "w")
    val out = Joins.range(points, "t", wide, "s", "e", Seq("user"), 1800)
    assert(out.count() == 1)
  }

  test("salted join returns exactly the plain join's rows") {
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "lv")
    val r = Seq((1L, "X"), (1L, "Y"), (3L, "Z")).toDF("k", "rv")
    val plain = l.join(r, Seq("k"))
    val salted = Joins.salted(l, r, Seq("k"), saltFactor = 4)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(datasetEquality(plain, salted))
    // the exchange runs on (k, salt): the salt column is a join key
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt key missing from plan:\n$plan")
  }

  test("range join plans an equi-join on (keys, bucket), never a cartesian") {
    val plan = Joins.range(points, "t", intervals, "s", "e", Seq("user"), 1800)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"cartesian in range-join plan:\n$plan")
  }

  test("bloom semi join equals the exact semi join (no false negatives)") {
    val fact = (1L to 200L).map(i => (i, s"row$i")).toDF("k", "payload")
    val dim = Seq(3L, 50L, 199L, 777L).toDF("dk")
    val out = Joins.bloomSemi(fact, dim, "k", "dk", mBits = 1 << 10, k = 3)
    val exact = fact.join(dim, fact("k") === dim("dk"), "leftsemi")
    assert(datasetEquality(exact, out))
  }

  test("bloom filter prunes non-matching rows before the join") {
    import graft.functions.Sketches
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val bits = Sketches.bloomBitmap(dim, $"dk", mBits = 1 << 12, k = 5)
    val fact = (1000L to 2000L).map(i => Tuple1(i)).toDF("k")
    val kept = fact.where(Sketches.bloomMightContain($"k", bits, 5)).count()
    // 1001 disjoint keys against a 4096-bit filter holding 3 values:
    // expected false positives ~ 1001 * (15/4096)^5 ~ 0 — allow a few
    assert(kept <= 5, s"bloom should prune nearly everything, kept $kept")
    val hits = Seq(1L, 2L, 3L).toDF("k")
      .where(Sketches.bloomMightContain($"k", bits, 5)).count()
    assert(hits == 3L, "members must always pass the filter")
  }

  private def tsv(s: String) = java.sql.Timestamp.valueOf(s)

  test("intervalOverlap equals the theta join, duplicate-free") {
    val left = Seq(
      (1L, 10L, tsv("2024-01-01 10:00:00"), tsv("2024-01-01 12:00:00")),
      (1L, 11L, tsv("2024-01-01 15:00:00"), tsv("2024-01-01 15:30:00")),
      (2L, 12L, tsv("2024-01-01 10:00:00"), tsv("2024-01-01 11:00:00"))
    ).toDF("k", "lid", "ls", "le")
    val right = Seq(
      // overlaps lid=10 across SEVERAL buckets -> must appear once
      (1L, 20L, tsv("2024-01-01 09:00:00"), tsv("2024-01-01 13:00:00")),
      // touches lid=10 exactly at its end (inclusive)
      (1L, 21L, tsv("2024-01-01 12:00:00"), tsv("2024-01-01 12:10:00")),
      // disjoint from everything on key 1
      (1L, 22L, tsv("2024-01-01 18:00:00"), tsv("2024-01-01 19:00:00")),
      // right key mismatch with lid=12
      (3L, 23L, tsv("2024-01-01 10:00:00"), tsv("2024-01-01 11:00:00"))
    ).toDF("k", "rid", "rs", "re")
    val out = Joins.intervalOverlap(left, "ls", "le", right, "rs", "re",
      Seq("k"), bucketSeconds = 900)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((10L, 20L), (10L, 21L)))
    // theta-join ground truth
    val theta = left.as("a").join(right.as("b"),
      $"a.k" === $"b.k" && $"a.ls" <= $"b.re" && $"b.rs" <= $"a.le")
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(out == theta)
  }

  test("intervalOverlap drops inverted intervals, no cartesian in plan") {
    val left = Seq((1L, 10L, tsv("2024-01-01 12:00:00"),
      tsv("2024-01-01 10:00:00"))).toDF("k", "lid", "ls", "le")
    val right = Seq((1L, 20L, tsv("2024-01-01 09:00:00"),
      tsv("2024-01-01 13:00:00"))).toDF("k", "rid", "rs", "re")
    val out = Joins.intervalOverlap(left, "ls", "le", right, "rs", "re",
      Seq("k"))
    assert(out.count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"bucketed join only:\n$plan")
  }
}

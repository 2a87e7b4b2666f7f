package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkRules: one row per rule, null condition counts as violation") {
    val df = Seq(
      (1, Some(10.0)), (2, Some(-3.0)), (3, None), (4, Some(5.0))
    ).toDF("id", "v")
    val out = DataQuality.checkRules(df, Seq(
        "v_positive" -> (col("v") > 0),
        "id_small" -> (col("id") <= 2)))
      .as[(String, Long, Long, Double)].collect()
    // v_positive: -3 violates, NULL violates -> 2 of 4
    assert(out(0) == (("v_positive", 2L, 4L, 0.5)))
    assert(out(1) == (("id_small", 2L, 4L, 0.5)))
  }

  test("checkRules preserves rule order and is a single aggregation") {
    val df = Seq((1, 2)).toDF("a", "b")
    val rules = Seq("r3" -> (col("a") > 0), "r1" -> (col("b") > 0),
      "r2" -> lit(true))
    val out = DataQuality.checkRules(df, rules)
    assert(out.select("rule_name").as[String].collect().toSeq ==
      Seq("r3", "r1", "r2"))
    // one global aggregate, no join/shuffle of the input per rule
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"rule engine must not join:\n$plan")
  }

  test("checkRules rejects empty and duplicate-name rule lists") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      DataQuality.checkRules(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataQuality.checkRules(df,
        Seq("r" -> (col("a") > 0), "r" -> (col("b") > 0)))
    }
  }

  test("linkageScore: weighted fuzzy + exact agreement, threshold filter") {
    val df = Seq(
      (1L, "x", "martha", "BUILDING"),
      (2L, "x", "marhta", "BUILDING"), // transposed pair, same segment
      (3L, "x", "zzzzzz", "AUTO"),
      (4L, "y", "martha", "BUILDING")  // other block: never paired with 1
    ).toDF("id", "blk", "name", "seg")
    val out = DataQuality.linkageScore(df, "id", "blk",
        fuzzyFields = Seq("name" -> 0.7), exactFields = Seq("seg" -> 0.3),
        minScore = 0.9)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect()
    // jw(martha, marhta) = 0.961111 (the classic example);
    // score = round(0.7 * 0.961111 + 0.3, 6) = 0.972778
    assert(out.toSeq == Seq((1L, 2L, 0.972778)))
  }

  test("linkageScore: exact-only agreement and block cap") {
    val df = (1 to 10).map(i => (i.toLong, "big", s"n$i", "S"))
      .toDF("id", "blk", "name", "seg")
    // block of 10 > maxBlock 5: dropped entirely
    val capped = DataQuality.linkageScore(df, "id", "blk",
      fuzzyFields = Seq.empty, exactFields = Seq("seg" -> 1.0),
      minScore = 0.5, maxBlock = 5)
    assert(capped.count() == 0)
    val all = DataQuality.linkageScore(df, "id", "blk",
      fuzzyFields = Seq.empty, exactFields = Seq("seg" -> 1.0),
      minScore = 0.5, maxBlock = 64)
    assert(all.count() == 45) // all pairs agree on seg -> score 1.0
  }

  test("linkage mandatory-exact prune: only join-key, never results") {
    val df = Seq(
      (1L, "x", "martha", "A"),
      (2L, "x", "marhta", "B"), // cross-segment near-identical name
      (3L, "x", "martha", "A")
    ).toDF("id", "blk", "name", "seg")
    // minScore 0.5 < 0.7 (the non-seg weight sum): seg is OPTIONAL —
    // the cross-segment pair must still appear, scored by name alone
    val loose = DataQuality.linkageScore(df, "id", "blk",
        Seq("name" -> 0.7), Seq("seg" -> 0.3), minScore = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(loose.contains((1L, 2L)), s"optional field dropped a pair: $loose")
    // minScore 0.95 > 0.7: seg becomes MANDATORY (join-key prune) — the
    // surviving set must equal the unpruned formula's threshold filter,
    // i.e. exactly the same-segment identical-name pair
    val strict = DataQuality.linkageScore(df, "id", "blk",
        Seq("name" -> 0.7), Seq("seg" -> 0.3), minScore = 0.95)
      .as[(Long, Long, Double)].collect().toSeq
    assert(strict == Seq((1L, 3L, 1.0)))
  }

  test("linkageScore is layout-independent") {
    val rows = (1 to 60).map(i =>
      (i.toLong, (i % 4).toString, s"name${i % 9}x$i", if (i % 2 == 0) "A" else "B"))
    val df1 = rows.toDF("id", "blk", "name", "seg")
    val df2 = df1.repartition(7).sortWithinPartitions(desc("id"))
    def run(d: org.apache.spark.sql.DataFrame) =
      DataQuality.linkageScore(d, "id", "blk",
        Seq("name" -> 0.6), Seq("seg" -> 0.4), minScore = 0.7)
        .orderBy("id_a", "id_b").collect().toSeq
    assert(run(df1) == run(df2))
    assert(run(df1).nonEmpty)
  }

  test("referentialCheck: orphans, null keys, per-check rows") {
    val child = Seq(Some(1L), Some(2L), None, Some(5L), Some(5L))
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = DataQuality.referentialCheck(Seq(
        ("c_p", child, "fk", parent, "pk")))
      .collect().head
    assert(out.getAs[String]("fk_name") == "c_p")
    assert(out.getAs[Long]("n_rows") == 5L)
    assert(out.getAs[Long]("n_null_keys") == 1L)
    assert(out.getAs[Long]("n_orphan_rows") == 2L)  // the two 5s
    assert(out.getAs[Long]("n_orphan_keys") == 1L)  // distinct key 5
    assert(out.getAs[Double]("orphan_rate") == 0.5) // 2 of 4 non-null
  }

  test("referentialCheck: parent payload never joins, keys deduplicate") {
    // duplicate parent keys must not multiply child rows
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("pk", "payload")
    val out = DataQuality.referentialCheck(Seq(
        ("c_p", child, "fk", parent, "pk"))).collect().head
    assert(out.getAs[Long]("n_rows") == 3L)
    assert(out.getAs[Long]("n_orphan_rows") == 0L)
  }

  test("referentialCheck rejects empty and duplicate-name check lists") {
    val d = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      DataQuality.referentialCheck(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataQuality.referentialCheck(Seq(
        ("x", d, "k", d, "k"), ("x", d, "k", d, "k")))
    }
  }

  test("fdCheck: violating groups counted, NULL is its own image") {
    val df = Seq(
      (1, Some("a")), (1, Some("a")), (1, Some("b")), // 1 -> {a,b} violates
      (2, Some("c")),                                 // 2 -> {c} holds
      (3, Some("x")), (3, None)                       // 3 -> {x,NULL} violates
    ).toDF("k", "v")
    val out = DataQuality.fdCheck(df, Seq("k"), "v").collect().head
    assert(out.getAs[Long]("n_groups") == 3L)
    assert(out.getAs[Long]("n_violating_groups") == 2L)
    assert(out.getAs[Long]("n_rows") == 6L)
    assert(out.getAs[Long]("n_rows_in_violating") == 5L)
    assert(out.getAs[Double]("violation_rate") == 2.0 / 3.0)
  }

  test("fdCheck: multi-column determinant, rhs excluded from lhs") {
    val df = Seq((1, 1, "a"), (1, 2, "b"), (1, 1, "a")).toDF("x", "y", "v")
    val out = DataQuality.fdCheck(df, Seq("x", "y"), "v").collect().head
    assert(out.getAs[Long]("n_groups") == 2L)
    assert(out.getAs[Long]("n_violating_groups") == 0L)
    intercept[IllegalArgumentException] {
      DataQuality.fdCheck(df, Seq("x", "v"), "v")
    }
  }

  test("imputeMode fills nulls with the group mode, ties to smallest") {
    val df = Seq(
      (1L, "g1", Option("b")), (2L, "g1", Option("b")),
      (3L, "g1", Option("a")), (4L, "g1", None),
      // g2: tie between "x" and "y" -> "x"
      (5L, "g2", Option("x")), (6L, "g2", Option("y")), (7L, "g2", None),
      // g3: all null -> stays null
      (8L, "g3", None)
    ).toDF("id", "g", "v")
    val out = DataQuality.imputeMode(df, "v", Seq("g"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(4L).contains("b"), "mode of g1 is b")
    assert(out(3L).contains("a"), "non-null rows untouched")
    assert(out(7L).contains("x"), "count tie breaks to smallest value")
    assert(out(8L).isEmpty, "a group with no evidence stays null")
    assert(out.size == 8)
  }

  test("reconcile: drift classified per group, absentees zero-filled") {
    val left = Seq(("A", 10.0), ("A", 20.0), ("B", 5.0), ("C", 7.0))
      .toDF("k", "v")
    // B matches exactly; A loses a row; C's sum drifts; D exists only
    // on the right
    val right = Seq(("A", 10.0), ("B", 5.0), ("C", 7.5), ("D", 1.0))
      .toDF("k", "v")
    val out = DataQuality.reconcile(left, right, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
          r.getAs[Boolean]("rows_match"), r.getAs[Boolean]("sums_match"))))
      .toMap
    assert(out("A") == ((2L, 1L, false, false)))
    assert(out("B") == ((1L, 1L, true, true)))
    assert(out("C") == ((1L, 1L, true, false)))
    assert(out("D") == ((0L, 1L, false, false)))
    assert(out.size == 4)
  }

  test("imputeMode preserves the value column's type") {
    val df = Seq((1L, "g", Option(5L)), (2L, "g", None))
      .toDF("id", "g", "v")
    val out = DataQuality.imputeMode(df, "v", Seq("g"))
    assert(out.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.where("id = 2").head.getLong(2) == 5L)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 skew guard for the grouped drift ops: a stratum whose
  * distinct-value cardinality exceeds `maxGroupDistinct` routes through
  * the distributed range-partitioned CDF instead of the per-group
  * window. Cumulative sums are exact longs, so the two routes must be
  * BIT-identical — pinned here by running the same skewed input through
  * both (threshold forced tiny vs default) and comparing whole rows.
  */
class GroupedDriftSkewSpec extends SparkSpec {
  import spark.implicits._

  // one amplified stratum ("big": 2000 distinct values per side, shifted
  // distributions) among many small ones — the exact shape the guard
  // exists for
  private def side(shift: Double) = {
    val small = (0 until 20).flatMap(g =>
      (0 until 25).map(i => (s"s$g", i * 1.5 + shift * (g % 3))))
    val big = (0 until 2000).map(i => ("big", i * 0.25 + shift))
    (small ++ big).toDF("g", "v")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("ksByGroup: distributed route is bit-identical to the window " +
      "route on a skewed stratum mix") {
    val a = side(0.0)
    val b = side(7.0)
    val windowed = Drift.ksByGroup(a, b, "g", "v") // default: all window
    val routed = Drift.ksByGroup(a, b, "g", "v", maxGroupDistinct = 100)
    assert(rows(windowed) == rows(routed))
    // sanity: the big stratum actually drifted and is present once
    val bigRow = routed.where(col("grp") === "big").collect()
    // shift 7 over the 0..500 span -> D = 7/500 = 0.014 exactly
    assert(bigRow.length == 1 && bigRow.head.getAs[Double]("d") > 0.01)
    graft.util.Caches.unpersistAll()
  }

  test("wassersteinByGroup: distributed route (with stitched lead) is " +
      "bit-identical to the window route") {
    val a = side(0.0)
    val b = side(7.0)
    val windowed = Drift.wassersteinByGroup(a, b, "g", "v")
    val routed = Drift.wassersteinByGroup(a, b, "g", "v",
      maxGroupDistinct = 100)
    assert(rows(windowed) == rows(routed))
    val bigRow = routed.where(col("grp") === "big").collect()
    assert(bigRow.length == 1 && bigRow.head.getAs[Double]("w1") > 1.0)
    graft.util.Caches.unpersistAll()
  }

  test("one-sided and single-value strata survive the routed path " +
      "unchanged") {
    // "only_a" exists on one side; "uni" has a single distinct value
    val a = ((0 until 300).map(i => ("skew", i.toDouble)) ++
      Seq(("only_a", 1.0), ("uni", 5.0))).toDF("g", "v")
    val b = ((0 until 300).map(i => ("skew", i + 0.5)) ++
      Seq(("uni", 5.0))).toDF("g", "v")
    val w = Drift.wassersteinByGroup(a, b, "g", "v")
    val r = Drift.wassersteinByGroup(a, b, "g", "v", maxGroupDistinct = 50)
    assert(rows(w) == rows(r))
    val k = Drift.ksByGroup(a, b, "g", "v")
    val kr = Drift.ksByGroup(a, b, "g", "v", maxGroupDistinct = 50)
    assert(rows(k) == rows(kr))
    graft.util.Caches.unpersistAll()
  }

  test("more than 64 oversized strata is loud") {
    val wide = (0 until 70).flatMap(g =>
      (0 until 30).map(i => (s"g$g", i.toDouble))).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      Drift.ksByGroup(wide, wide, "g", "v", maxGroupDistinct = 10)
        .collect())
    assert(e.getMessage.contains("not a stratification"))
    graft.util.Caches.unpersistAll()
  }
}

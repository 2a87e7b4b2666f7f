package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, None, Some(2.5)),
    (3L, Some("a"), None)
  ).toDF("id", "s", "v")

  test("profile reports rows, nulls, cardinality and bounds per column") {
    val out = Profile.table(df, Seq("id", "s", "v")).orderBy("column")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("id") == ((3L, 0L, 3L, "1", "3")))
    assert(out("s") == ((3L, 1L, 1L, "a", "a")))
    assert(out("v") == ((3L, 1L, 2L, "1.5", "2.5")))
  }

  test("drift flags only columns whose stats moved; null bounds are no drift") {
    val before = Seq((1L, Some("a"), Option.empty[Double]),
      (2L, Some("b"), None), (3L, Some("a"), None)).toDF("id", "s", "v")
    // id loses a row (n_rows/n_distinct/max move); s unchanged values but
    // fewer rows -> drifted; v stays all-null -> bounds NULL both sides,
    // but its n_rows changes too. Use same-rowcount variant for a clean
    // "no drift" case: change nothing at all.
    val same = Profile.drift(before, before, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column") ->
        r.getAs[Boolean]("drifted")).toMap
    assert(same == Map("id" -> false, "s" -> false, "v" -> false))
    val after = Seq((1L, Some("a"), Option.empty[Double]),
      (2L, Some("b"), None)).toDF("id", "s", "v")
    val out = Profile.drift(before, after, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column") ->
        r.getAs[Boolean]("drifted")).toMap
    // every column lost a row -> all drift on n_rows; the all-null v must
    // not produce a NULL flag from its NULL <=> NULL bounds
    assert(out == Map("id" -> true, "s" -> true, "v" -> true))
  }

  test("neither mode plans the multi-distinct expand") {
    val exactPlan = Profile.table(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    val approxPlan = Profile.table(df, Seq("id", "s", "v"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      s"exact mode must group-then-count per column, not expand:\n$exactPlan")
    assert(!approxPlan.contains("Expand"),
      s"approx mode must avoid the expand:\n$approxPlan")
    // approx distinct stays sane on tiny data
    val nd = Profile.table(df, Seq("id"), exact = false).head().getLong(3)
    assert(nd == 3L)
  }

  test("exact mode partially aggregates map-side per column") {
    val plan = Profile.table(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    // each column branch: partial_count under the value-key exchange, so
    // the shuffle carries distinct values only, never raw rows
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(plan.contains("Union"), s"expected per-column branches:\n$plan")
  }

  test("outliers flags beyond sigma*std per group; zero-variance flags none") {
    val data = Seq(
      ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 1.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)
    ).toDF("g", "v")
    val out = Profile.outliers(data, "v", Seq("g"), sigma = 1.5)
    val flagged = out.where($"is_outlier").select("g", "v")
      .as[(String, Double)].collect().toSeq
    assert(flagged == Seq(("a", 100.0)))
    // zero-variance group: nothing flagged, z = 0
    assert(out.where($"g" === "b" && $"is_outlier").count() == 0)
    assert(out.where($"g" === "b").select("z").as[Double]
      .collect().forall(_ == 0.0))
    // schema: input columns plus z and is_outlier
    assert(out.columns.toSeq == data.columns.toSeq ++ Seq("z", "is_outlier"))
  }

  test("histogram bins by floor division, drops nulls, counts exactly") {
    val data = Seq(Some(0.0), Some(199.9), Some(200.0), Some(450.0), None)
      .toDF("v")
    val out = Profile.histogram(data, "v", 200.0).orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0.0, 2L), (1L, 200.0, 1L), (2L, 400.0, 1L)))
  }

  test("approx mode stays a single scan (no per-column union)") {
    val plan = Profile.table(df, Seq("id", "s", "v"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      s"per-column union means multiple scans:\n$plan")
  }

  test("bucketizeQuantile assigns equi-depth bins; equal values share a bin") {
    val data = (1 to 8).map(_.toDouble) ++ Seq(4.0, 4.0) // two extra 4s
    val out = Profile.bucketizeQuantile(data.toDF("v"), "v", nBins = 4)
      .groupBy("bin").count().orderBy("bin")
      .as[(Long, Long)].collect().toSeq
    // every row lands in exactly one of 1..4 and all 4.0s share one bin
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._2).sum == 10L)
    val fourBins = Profile.bucketizeQuantile(data.toDF("v"), "v", 4)
      .where($"v" === 4.0).select("bin").distinct().count()
    assert(fourBins == 1L)
  }

  test("bucketizeQuantile drops nulls and keeps input columns") {
    val data = Seq(Some(1.0), Some(2.0), None, Some(3.0), Some(4.0)).toDF("v")
    val out = Profile.bucketizeQuantile(data, "v", 2)
    assert(out.columns.toSeq == Seq("v", "bin"))
    assert(out.count() == 4)
  }

  test("winsorize clamps exactly to the discrete percentile bounds") {
    val data = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profile.winsorize(data, "v", 0.05, 0.95)
      .agg(org.apache.spark.sql.functions.min("winsorized"),
        org.apache.spark.sql.functions.max("winsorized"))
      .as[(Double, Double)].collect().head
    assert(out == ((5.0, 95.0)))
  }

  test("winsorized values inside the bounds are bit-copies of the input") {
    val data = Seq(1.0, 2.5, 3.7, 100.0).toDF("v")
    val out = Profile.winsorize(data, "v", 0.0, 1.0)
      .where($"v" =!= $"winsorized").count()
    assert(out == 0L)
  }

  test("the assignment pass is narrow: bounds broadcast, no data shuffle") {
    val data = (1 to 20).map(_.toDouble).toDF("v")
    val plan = Profile.bucketizeQuantile(data, "v", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bounds must broadcast:\n$plan")
  }

  test("outliersMad flags the tail the mean-based z-score misses") {
    // 9 values at 1..9 plus one 1e9 typo: the corrupt value drags the
    // MEAN/STD so hard that its own z is capped at (n-1)/sqrt(n) = 2.85
    // < 3 (the max z any single sample point can reach), while the
    // MEDIAN doesn't move at all
    val vals = (1 to 9).map(_.toDouble) :+ 1e9
    val df = vals.map(("g", _)).toDF("grp", "v")
    val mad = Profile.outliersMad(df, "v", Seq("grp"), k = 3.5)
    val flagged = mad.where($"is_outlier").select("v").as[Double].collect()
    assert(flagged.toSeq == Seq(1e9), s"got ${flagged.toSeq}")
    // the classical z-score at sigma=3 does NOT flag it (dragged moments)
    val z = Profile.outliers(df, "v", Seq("grp"), sigma = 3.0)
      .where($"is_outlier").count()
    assert(z == 0L, "mean-based z should be blind to a single huge typo")
  }

  test("outliersMad: zero-MAD groups flag nothing") {
    val df = (Seq.fill(10)(5.0) :+ 100.0).map(("g", _)).toDF("grp", "v")
    // median=5, deviations are 0 x10 and 95 -> MAD=0 -> no flags
    val out = Profile.outliersMad(df, "v", Seq("grp"))
    assert(out.where($"is_outlier").count() == 0L)
    assert(out.where($"robust_z" =!= 0.0).count() == 0L)
  }

  test("correlation: exact +1/-1 on linear data, ~0 on independent") {
    val lin = (1 to 50).map(i => ("g", i.toDouble, 3.0 * i + 7)).toDF("grp", "x", "y")
    val c1 = Profile.correlation(lin, "x", "y", Seq("grp"))
      .head.getAs[Double]("corr")
    assert(c1 == 1.0, s"perfect line must give exactly 1 after 6dp: $c1")
    val neg = (1 to 50).map(i => ("g", i.toDouble, -2.0 * i)).toDF("grp", "x", "y")
    assert(Profile.correlation(neg, "x", "y", Seq("grp"))
      .head.getAs[Double]("corr") == -1.0)
    // h32-scrambled pairing: no linear relationship
    val rnd = new scala.util.Random(3)
    val ind = (1 to 500).map(_ => ("g", rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("grp", "x", "y")
    val c0 = Profile.correlation(ind, "x", "y", Seq("grp"))
      .head.getAs[Double]("corr")
    assert(math.abs(c0) < 0.15, s"independent draws correlated: $c0")
  }

  test("correlation: zero-variance side yields 0, groups are independent") {
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0), ("a", 3.0, 5.0),
      ("b", 1.0, 1.0), ("b", 2.0, 2.0)).toDF("grp", "x", "y")
    val out = Profile.correlation(df, "x", "y", Seq("grp"))
      .orderBy("grp").collect()
    assert(out(0).getAs[Double]("corr") == 0.0) // y constant in a
    assert(out(1).getAs[Double]("corr") == 1.0)
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(3L, 2L))
  }

  test("linearFit: exact coefficients on a noiseless line, degenerate " +
      "variances resolve to NULL/0, groups independent, layout-invariant") {
    val df = ((1 to 20).map(i => ("line", i.toDouble, 2.0 * i + 1))
      ++ (1 to 5).map(i => ("flat", i.toDouble, 7.0))       // y constant
      ++ (1 to 5).map(_ => ("vert", 3.0, 9.0))              // x constant
      ).toDF("grp", "x", "y")
    val out = Profile.linearFit(df, "x", "y", Seq("grp"))
      .orderBy("grp").collect()
      .map(r => r.getString(0) -> r).toMap
    val line = out("line")
    assert(line.getAs[Double]("slope") == 2.0
      && line.getAs[Double]("intercept") == 1.0
      && line.getAs[Double]("r2") == 1.0, line.toString)
    val flat = out("flat")
    assert(flat.getAs[Double]("slope") == 0.0
      && flat.getAs[Double]("intercept") == 7.0
      && flat.isNullAt(flat.fieldIndex("r2")), flat.toString)
    val vert = out("vert")
    assert(vert.isNullAt(vert.fieldIndex("slope"))
      && vert.isNullAt(vert.fieldIndex("intercept"))
      && vert.isNullAt(vert.fieldIndex("r2")), vert.toString)
    val again = Profile.linearFit(df.repartition(9), "x", "y", Seq("grp"))
      .orderBy("grp").collect().map(_.toString).toSeq
    assert(again == Profile.linearFit(df, "x", "y", Seq("grp"))
      .orderBy("grp").collect().map(_.toString).toSeq)
  }

  test("outliersMad groups independently") {
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ (("a", 1000.0)) :+
      (("b", 1000.0))).toDF("grp", "v")
    val out = Profile.outliersMad(df, "v", Seq("grp"))
      .where($"is_outlier").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 1000.0))) // b's single row is its own median: no flag
  }

  test("percentileRank: (rank-1)/(n-1) per group, deterministic on ties") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 30.0), ("b", 5L, 99.0))
      .toDF("grp", "id", "v")
    val out = Profile.percentileRank(df, "v", "id", Seq("grp"))
      .select("id", "pct_rank").as[(Long, Double)].collect().toMap
    // ties on v are broken by id: ranks 1..4 -> 0, 1/3, 2/3, 1
    assert(out(1L) == 0.0 && out(4L) == 1.0)
    assert(out(2L) == 0.333333 && out(3L) == 0.666667)
    assert(out(5L) == 0.0, "single-member group ranks 0.0")
    // pure function of (value, id): layout does not matter
    val again = Profile.percentileRank(df.repartition(7), "v", "id",
      Seq("grp")).select("id", "pct_rank").as[(Long, Double)].collect().toMap
    assert(again == out)
    intercept[IllegalArgumentException] {
      Profile.percentileRank(df, "v", "id", Seq.empty)
    }
  }

  test("joinSkew: exact per-key contributions, top-k by product") {
    val l = Seq(1L, 1L, 1L, 2L, 2L, 3L, 9L).toDF("k")
    val r = Seq(1L, 1L, 2L, 3L, 3L, 3L, 8L).toDF("k")
    val out = Profile.joinSkew(l, "k", r, "k", k = 2)
      .as[(Long, Long, Long, Long)].collect()
    // key 1: 3*2=6; key 3: 1*3=3; key 2: 2*1=2; keys 8,9 one-sided -> 0
    assert(out.toSeq == Seq((1L, 3L, 2L, 6L), (3L, 1L, 3L, 3L)))
  }

  test("joinSkew plan: top-k never global-sorts the counts, map-side combined") {
    // k must stay BELOW the input's derivable maxRows: EliminateLimits
    // drops a limit that provably cannot bind (tiny local relations
    // carry maxRows), and with it the TakeOrdered conversion
    val l = Seq(1L, 2L, 3L).toDF("k")
    val out = Profile.joinSkew(l, "k", l, "k", k = 2)
    // sparkPlan (the strategy output) — the sink/write path plans the
    // terminal Limit(Sort) as TakeOrderedAndProject; the adaptive
    // wrapper's collect path re-routes through CollectLimit, so
    // executedPlan would hide the conversion
    val plan = out.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a limit-bounded top-k, not an unbounded sort:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"expected partial aggregation:\n$plan")
  }

  test("benford: digit extraction, sub-1 and NULL rows ignored") {
    val df = Seq(Some(1.5), Some(19.0), Some(2.3), Some(0.5), None,
      Some(-25.0)).toDF("v")
    val out = Profile.benford(df, "v").orderBy("digit").collect()
    // digits: 1 (1.5), 1 (19), 2 (2.3), 2 (|-25|); 0.5 and NULL ignored
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 2L), (2, 2L)))
    val d1 = out.head
    assert(d1.getAs[Double]("share") == 0.5)
    assert(d1.getAs[Double]("expected_share") == math.log10(2.0))
    assert(d1.getAs[Double]("deviation") == 0.5 - math.log10(2.0))
  }

  test("benford: every digit 1-9 reachable, shares sum to 1") {
    val df = (1 to 9).flatMap(d => Seq.fill(d)(d * 100.0 + 7)).toDF("v")
    val out = Profile.benford(df, "v").collect()
    assert(out.map(_.getInt(0)).sorted.toSeq == (1 to 9))
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
  }

  test("correlationMatrix: perfect/anti/zero correlations, scale invariance") {
    // y = 2x (corr 1), z = -x (corr -1), w uncorrelated-ish constant+flip
    val df = Seq.tabulate(40) { i =>
      val x = (i - 20).toDouble
      (x * 1000, 2 * x * 1000, -x, if (i % 2 == 0) 1.0 else -1.0)
    }.toDF("x", "y", "z", "w")
    val c = Profile.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(c((0L, 0L)) == 1.0 && c((1L, 1L)) == 1.0)
    assert(math.abs(c((0L, 1L)) - 1.0) < 1e-5, s"x~y: ${c((0L, 1L))}")
    assert(math.abs(c((0L, 2L)) + 1.0) < 1e-5, s"x~z: ${c((0L, 2L))}")
    assert(math.abs(c((0L, 3L))) < 0.05, s"x~w: ${c((0L, 3L))}")
  }

  test("correlationMatrix: zero-variance column yields null, layout-free") {
    val df = Seq.tabulate(20)(i => (i.toDouble, 5.0)).toDF("a", "b")
    val c = Profile.correlationMatrix(df, Seq("a", "b"))
      .orderBy("i", "j").collect()
    assert(c.find(r => r.getLong(0) == 0 && r.getLong(1) == 1)
      .exists(_.isNullAt(2)), "corr against constant column is null")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.correlationMatrix(d, Seq("a", "b")).orderBy("i", "j")
        .collect().toSeq
    assert(run(df) == run(df.repartition(7)))
    graft.util.Caches.unpersistAll()
  }

  test("corpusReport: exact one-row audit on a hand-built corpus") {
    val df = Seq(
      (1L, "clean text one", "en", "web"),
      (2L, "clean text one", "en", "web"),          // exact dup of 1
      (3L, "mail bob@x.io now", "de", "web"),       // pii
      (4L, "something else", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val r = Profile.corpusReport(df, "doc_id", "text", "lang", "source")
      .head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_exact_dups") == 1L)
    assert(r.getAs[Double]("dup_rate") == 0.25)
    assert(r.getAs[Long]("n_pii_docs") == 1L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[String]("top_source") == "web")
    assert(r.getAs[Double]("top_source_share") == 0.75)
  }

  test("corpusReport plans no multi-distinct Expand") {
    val df = Seq((1L, "t", "en", "web")).toDF("doc_id", "text", "lang", "source")
    val plan = Profile.corpusReport(df, "doc_id", "text", "lang", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"multi-distinct Expand in plan:\n$plan")
  }

  test("trimmedMean: tails excluded, hand-computed band mean") {
    // group g: values 1..10 plus an outlier 1000. Interpolated bounds on
    // the 11 values: p05 at rank 1.5 -> 1.5, p95 at rank 10.5 -> 505; so
    // the band keeps 2..10 (9 values, mean 6)
    val df = ((1 to 10).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("k", "v")
    val out = Profile.trimmedMean(df, "v", Seq("k"), 0.05, 0.95).head
    assert(out.getLong(1) == 9L, s"kept ${out.getLong(1)}")
    assert(out.getDouble(2) == 6.0)
  }

  test("trimmedMean: per-group bands, layout independence, null safety") {
    val df = (1 to 60).map(i =>
      (s"g${i % 3}", if (i % 17 == 0) None else Some((i % 13).toDouble)))
      .toDF("k", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.trimmedMean(d, "v", Seq("k"), 0.1, 0.9)
        .orderBy("k").collect().toSeq
    assert(run(df) == run(df.repartition(7)))
    assert(run(df).size == 3)
    graft.util.Caches.unpersistAll()
  }

  test("gini: equality scores 0, one-owner scores (n-1)/n, hand value " +
      "with ties, negatives refuse, layout-invariant") {
    val eq = Seq.fill(6)(("g", 5.0)).toDF("g", "v")
    assert(Profile.gini(eq, "v", Seq("g")).collect().head
      .getAs[Double]("gini") == 0.0)
    val one = (Seq.fill(3)(("g", 0.0)) :+ ("g", 10.0)).toDF("g", "v")
    assert(Profile.gini(one, "v", Seq("g")).collect().head
      .getAs[Double]("gini") == 0.75) // (n-1)/n at n = 4
    // hand: sorted [1,1,2,4]: sum(2i-n-1)x = (-3)·1+(-1)·1+1·2+3·4 = 10;
    // G = 10/(4·8) = 0.3125
    val mix = Seq(("a", 1.0), ("a", 4.0), ("a", 2.0), ("a", 1.0),
      ("b", 7.0)).toDF("g", "v")
    val out = Profile.gini(mix, "v", Seq("g")).orderBy("g").collect()
    assert(out(0).getAs[Double]("gini") == 0.3125, out(0).toString)
    assert(out(1).getAs[Double]("gini") == 0.0, "singleton group is even")
    val ex = intercept[IllegalArgumentException] {
      Profile.gini(Seq(("g", -1.0)).toDF("g", "v"), "v", Seq("g"))
    }
    assert(ex.getMessage.contains("non-negative"))
    val rep = Profile.gini(mix.repartition(5), "v", Seq("g"))
      .orderBy("g").collect()
    assert(rep.map(_.toString).toSeq == out.map(_.toString).toSeq)
    graft.util.Caches.unpersistAll()
  }
}

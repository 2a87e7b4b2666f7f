package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha alpha beta", "good"),
    (2L, "alpha beta beta", "good"),
    (3L, "zork zork gork", "bad"),
    (4L, "gork zork zork", "bad"),
    (5L, "alpha beta alpha beta", "unseen"), // pos-vocab, unlabeled source
    (6L, "zork gork gork", "unseen"),        // neg-vocab, unlabeled source
    (7L, "", "unseen")                       // token-less: prior only
  ).toDF("doc_id", "text", "source")

  test("naiveBayes separates the classes it was trained on") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source") === "good", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 7, "every input doc scores exactly once")
    // held-out docs land on the side their vocabulary belongs to
    assert(out(5L)._2 > 0 && out(5L)._3, "positive-vocab doc must score > 0")
    assert(out(6L)._2 < 0 && !out(6L)._3, "negative-vocab doc must score < 0")
    // training docs classify correctly too
    assert(out(1L)._3 && out(2L)._3 && !out(3L)._3 && !out(4L)._3)
    graft.util.Caches.unpersistAll()
  }

  test("token-less docs carry the prior alone") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source") === "good", buckets = 64)
      .where(col("doc_id") === 7L).collect().head
    assert(out.getLong(1) == 0L)
    // prior = ln((2+1)/(5+1)) = ln(0.5) in micro-nats
    val expected = math.rint(math.log(3.0 / 6.0) * 1e6) / 1e6
    assert(math.abs(out.getDouble(2) - expected) < 1e-9,
      s"got ${out.getDouble(2)}, want $expected")
    graft.util.Caches.unpersistAll()
  }

  test("a one-class corpus degrades gracefully (add-one smoothing)") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source").isNotNull, buckets = 64)
      .collect()
    assert(out.length == 7)
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    assert(out.forall(_.getBoolean(3)), "all-positive corpus predicts positive")
    graft.util.Caches.unpersistAll()
  }

  test("feature hashing bounds the model: tiny bucket count still runs") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source") === "good", buckets = 2)
    assert(out.count() == 7)
    graft.util.Caches.unpersistAll()
  }

  test("rocAuc: perfect separation, inversion, ties at half, degenerate classes") {
    def auc(rows: Seq[(Boolean, Double)]): java.lang.Double = {
      val r = Classify.rocAuc(rows.toDF("label", "score"), "label", "score")
        .collect().head
      if (r.isNullAt(2)) null else r.getDouble(2)
    }
    // perfect: every positive above every negative
    assert(auc(Seq((true, 3.0), (true, 2.0), (false, 1.0), (false, 0.0)))
      == 1.0)
    // inverted scores
    assert(auc(Seq((true, 0.0), (false, 1.0))) == 0.0)
    // all scores equal: every pair is a tie -> 0.5
    assert(auc(Seq((true, 1.0), (true, 1.0), (false, 1.0))) == 0.5)
    // hand-computed with one tie: pairs (p=2, n=2): (2,1):win, (2,0):win,
    // (1,1):tie, (1,0):win -> (3 + 0.5)/4 = 0.875
    assert(auc(Seq((true, 2.0), (true, 1.0), (false, 1.0), (false, 0.0)))
      == 0.875)
    // degenerate: one class only -> NULL, not 0/0
    assert(auc(Seq((true, 1.0), (true, 2.0))) == null)
    graft.util.Caches.unpersistAll()
  }

  test("rocAuc matches the O(n^2) definition on a random batch") {
    val rnd = new scala.util.Random(12)
    val rows = Seq.fill(300)((rnd.nextBoolean(),
      (rnd.nextInt(40) - 20) / 4.0)) // coarse grid -> plenty of ties
    val got = Classify.rocAuc(rows.toDF("label", "score"), "label", "score")
      .collect().head.getDouble(2)
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val num = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val want = math.rint(num / (pos.size * neg.size) * 1e6) / 1e6
    assert(got == want, s"got $got, want $want")
    graft.util.Caches.unpersistAll()
  }

  test("confusion: hand-computed counts and ratios, empty-denominator NULL") {
    val df = Seq(
      (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false), (false, false)
    ).toDF("label", "pred")
    val r = Classify.confusion(df, "label", "pred").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 1L, 3L)))
    assert(r.getDouble(4) == math.rint(5.0 / 7.0 * 1e6) / 1e6) // accuracy
    assert(r.getDouble(5) == math.rint(2.0 / 3.0 * 1e6) / 1e6) // precision
    assert(r.getDouble(6) == math.rint(2.0 / 3.0 * 1e6) / 1e6) // recall
    assert(r.getDouble(7) == math.rint(4.0 / 6.0 * 1e6) / 1e6) // f1
    // no predicted positives: precision NULL, recall 0
    val r2 = Classify.confusion(
      Seq((true, false), (false, false)).toDF("label", "pred"),
      "label", "pred").collect().head
    assert(r2.isNullAt(5) && r2.getDouble(6) == 0.0)
  }

  test("reliabilityBins: floor binning, exact mean, pos rates") {
    val df = Seq(
      (true, 2.5), (false, 2.9),   // bin 2: rate 0.5, mean 2.7
      (true, -0.5), (true, -0.25), // bin -1: rate 1.0, mean -0.375
      (false, 0.0)                 // bin 0: rate 0.0
    ).toDF("label", "score")
    val out = Classify.reliabilityBins(df, "label", "score", binWidth = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(2L, -1L, 0L))
    assert(out(2L) == ((2L, 1L, 0.5, 2.7)))
    assert(out(-1L) == ((2L, 2L, 1.0, -0.375)))
    assert(out(0L) == ((1L, 0L, 0.0, 0.0)))
  }

  test("agreement: hand-computed kappa, skew correction, NULL handling") {
    // 2x2: a=(x,x,x,y), b=(x,x,y,y): po=3/4; marginals a:(3,1) b:(2,2)
    // pe = (3*2 + 1*2)/16 = 0.5 -> kappa = (0.75-0.5)/0.5 = 0.5
    val df = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("y", "y"))
      .toDF("a", "b")
    val r = Classify.agreement(df, "a", "b").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 0.5
      && r.getDouble(4) == 0.5)
    // both-constant equal labelers: pe = 1 -> kappa NULL (not NaN)
    val r2 = Classify.agreement(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").collect().head
    assert(r2.getDouble(2) == 1.0 && r2.isNullAt(4))
    // NULLs are a category: (null, null) agrees, (x, null) does not
    val r3 = Classify.agreement(
      Seq((null, null), ("x", null), ("x", "x"))
        .asInstanceOf[Seq[(String, String)]].toDF("a", "b"),
      "a", "b").collect().head
    assert(r3.getLong(0) == 3L && r3.getLong(1) == 2L)
    graft.util.Caches.unpersistAll()
  }

  test("mcnemar: hand-computed discordant cells, continuity " +
      "correction, identical-model degenerate, NULL drops") {
    // label always true; A right on 15, B right on 11; discordant:
    // b = A-only = 5, c = B-only = 1; concordant both-right 10
    val rows =
      (1 to 10).map(_ => (true, true, true)) ++   // both right
      (1 to 5).map(_ => (true, true, false)) ++   // A only
      (1 to 1).map(_ => (true, false, true)) ++   // B only
      (1 to 3).map(_ => (true, false, false))     // both wrong
    val df = rows.toDF("y", "pa", "pb")
    val r = Classify.mcnemar(df, "y", "pa", "pb").collect().head
    assert(r.getAs[Long]("n") == 19)
    assert(r.getAs[Long]("a_only") == 5 && r.getAs[Long]("b_only") == 1)
    assert(r.getAs[Long]("both_right") == 10 &&
      r.getAs[Long]("both_wrong") == 3)
    // chi2 = (5-1)^2/6 = 2.666667; cc = (4-1)^2/6 = 1.5
    assert(math.abs(r.getAs[Double]("chi2") - 16.0 / 6.0) < 1e-5)
    assert(r.getAs[Double]("chi2_cc") == 1.5)
    val P = graft.functions.PValues
    assert(math.abs(r.getAs[Double]("p_value") -
      P.chiSqSurvival(16.0 / 6.0, 1)) < 1e-5)
    assert(r.getAs[Double]("p_cc") > r.getAs[Double]("p_value"))
    // identical predictions: no discordance -> NULL chi2, p = 1
    val same = Seq((true, true, true), (false, true, true))
      .toDF("y", "pa", "pb")
    val rs = Classify.mcnemar(same, "y", "pa", "pb").collect().head
    assert(rs.isNullAt(rs.fieldIndex("chi2")) &&
      rs.getAs[Double]("p_value") == 1.0)
    // NULL rows drop
    val withNull = df.unionByName(
      Seq((None: Option[Boolean], Some(true), Some(true)))
        .toDF("y", "pa", "pb"))
    assert(Classify.mcnemar(withNull, "y", "pa", "pb")
      .collect().head.getAs[Long]("n") == 19)
  }

  test("conformal: exact order-statistic half-width, finite-sample " +
      "coverage on the audit slice, brute reference, guards") {
    // calibration residuals are exactly 1..20 (y = yhat + i)
    val cal = (1 to 20).map(i => (10.0 + i, 10.0)).toDF("y", "yhat")
    val test = (1 to 10).map(i => (10.0 + 2 * i, 10.0)).toDF("y", "yhat")
    // alpha = 0.2: rank = ceil(21·0.8) = 17 -> q = 17
    val r = Classify.conformal(cal, test, "y", "yhat", alpha = 0.2)
      .collect().head
    assert(r.getAs[Long]("n_cal") == 20 && r.getAs[Long]("rank") == 17)
    assert(r.getAs[Double]("q") == 17.0)
    // test residuals 2,4,..,20: covered = those <= 17 -> 8 of 10
    assert(r.getAs[Long]("n_covered") == 8)
    assert(r.getAs[Double]("coverage") == 0.8)
    // brute reference on seeded data: rank-th smallest sorted residual
    val rnd = new scala.util.Random(5150)
    val ys = (1 to 200).map(_ => rnd.nextDouble() * 50)
    val cal2 = ys.map(y => (y, 25.0)).toDF("y", "yhat")
    val r2 = Classify.conformal(cal2, test, "y", "yhat", alpha = 0.1)
      .collect().head
    def snap(x: Double) = math.round(x * 1048576d)
    val res = ys.map(y => math.abs(snap(y) - snap(25.0))).sorted
    val rank = math.min(200, math.ceil(201 * 0.9).toInt)
    assert(r2.getAs[Long]("rank") == rank)
    // q reports at 6dp; compare against the exact order statistic
    assert(math.abs(r2.getAs[Double]("q") -
      res(rank - 1).toDouble / 1048576d) < 1e-6)
    intercept[IllegalArgumentException] {
      Classify.conformal(cal, test, "y", "yhat", alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Classify.conformal(cal.where(lit(false)), test, "y", "yhat")
        .collect()
    }
    graft.util.Caches.unpersistAll()
  }

  test("krippendorffAlpha: exact-integer replay on a 3-rater fixture " +
      "with missing labels; single-label units excluded") {
    // unit 5 has ONE label (the other raters abstained) — unpairable,
    // it must contribute nothing to any total
    val df = Seq(
      (1L, Some("a"), Some("a"), Some("a")),
      (2L, Some("a"), Some("b"), None),
      (3L, Some("b"), Some("b"), Some("b")),
      (4L, Some("b"), Some("a"), Some("b")),
      (5L, Some("a"), None, None)
    ).toDF("u", "r1", "r2", "r3")
    // brute replay of the L-scaled integer formulation (L = 2)
    val units = Seq(
      Seq("a", "a", "a"), Seq("a", "b"), Seq("b", "b", "b"),
      Seq("b", "a", "b")) // unit 5 dropped: m = 1
    val L = 2L
    val al = units.map { vs =>
      val m = vs.size.toLong
      val s = vs.groupBy(identity).values.map(g => g.size.toLong * g.size)
        .sum
      (L / (m - 1)) * (m * m - s)
    }.sum
    val nc = units.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = nc.values.sum
    val b = n * n - nc.values.map(c => c * c).sum
    val expected = BigDecimal(
      1.0 - (n - 1).toDouble * al / (L * b).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val out = Classify.krippendorffAlpha(df, "u", Seq("r1", "r2", "r3"))
      .collect().head
    assert(out.getLong(0) == 4L, out.toString) // pairable units
    assert(out.getLong(1) == 2L) // values a, b
    assert(out.getLong(2) == n)
    assert(out.getDouble(3) == expected, s"$out vs $expected")
    val rp = Classify
      .krippendorffAlpha(df.repartition(5), "u", Seq("r1", "r2", "r3"))
      .collect().head
    assert(rp.toString == out.toString)
    graft.util.Caches.unpersistAll()
  }

  test("krippendorffAlpha: perfect agreement is 1, one-category data " +
      "is NULL (indeterminate), not a fake 1") {
    val perfect = Seq((1L, "x", "x"), (2L, "y", "y"), (3L, "x", "x"))
      .toDF("u", "r1", "r2")
    val p = Classify.krippendorffAlpha(perfect, "u", Seq("r1", "r2"))
      .collect().head
    assert(p.getDouble(3) == 1.0, p.toString)
    val mono = Seq((1L, "x", "x"), (2L, "x", "x")).toDF("u", "r1", "r2")
    val m = Classify.krippendorffAlpha(mono, "u", Seq("r1", "r2"))
      .collect().head
    assert(m.isNullAt(3), m.toString)
    intercept[IllegalArgumentException] {
      Classify.krippendorffAlpha(perfect, "u", Seq("r1"))
    }
    graft.util.Caches.unpersistAll()
  }
}

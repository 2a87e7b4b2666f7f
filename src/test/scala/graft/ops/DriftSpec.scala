package graft.ops

import graft.SparkSpec
import graft.functions.PValues
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("ksStatistic: hand-computed D over a small pair of samples") {
    val a = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 3.0, 4.0).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").collect().head
    // cumA over {1,2,3,4} = 1,3,4,4; cumB = 0,1,3,4; nA = nB = 4
    // d_num = |cumA*4 - cumB*4| = 4, 8, 4, 0 -> max 8 at v=2
    assert(r.getAs[Double]("split_value") == 2.0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("d_num") == 8.0)
    assert(r.getAs[Double]("d") == 0.5)
  }

  test("ksStatistic: ties on d_num resolve to the smallest value") {
    val a = Seq(1.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").collect().head
    // d_num = 2 at v=1 and v=3 -> smallest value wins
    assert(r.getAs[Double]("split_value") == 1.0)
    assert(r.getAs[Double]("d_num") == 2.0)
  }

  test("ksStatistic: identical samples give D = 0 and ignore NULLs") {
    val a = Seq(Some(1.0), Some(2.0), None).toDF("v")
    val b = Seq(Some(1.0), Some(2.0)).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").collect().head
    assert(r.getAs[Long]("n_a") == 2L) // NULL dropped
    assert(r.getAs[Double]("d_num") == 0.0)
    assert(r.getAs[Double]("d") == 0.0)
  }

  test("ksStatistic result is independent of input partitioning") {
    val a = spark.range(0, 500).select((col("id") % 37).cast("double").as("v"))
    val b = spark.range(0, 400).select((col("id") % 41).cast("double").as("v"))
    val r1 = Drift.ksStatistic(a, b, "v").collect().head
    val r2 = Drift.ksStatistic(a.repartition(7), b.repartition(3), "v")
      .collect().head
    assert(r1 == r2)
  }

  test("categoricalDrift: exact L1 numerators, one-sided categories, NULL") {
    val a = Seq(Some("x"), Some("x"), Some("y"), None).toDF("c")
    val b = Seq(Some("x"), Some("z")).toDF("c")
    val out = Drift.categoricalDrift(a, b, "c")
      .orderBy(asc_nulls_first("category"))
      .collect()
    // nA = 4, nB = 2
    val byCat = out.map(r => Option(r.getString(0)) ->
      (r.getLong(1), r.getLong(2),
        r.getAs[Double](5).toLong)).toMap
    assert(byCat(Some("x")) == ((2L, 1L, 0L)))   // |2*2 - 1*4| = 0
    assert(byCat(Some("y")) == ((1L, 0L, 2L)))   // |1*2 - 0| = 2
    assert(byCat(Some("z")) == ((0L, 1L, 4L)))   // |0 - 1*4| = 4
    assert(byCat(None) == ((1L, 0L, 2L)))        // NULL is its own category
    val x = out.find(_.getString(0) == "x").get
    assert(x.getDouble(3) == 0.5 && x.getDouble(4) == 0.5)
  }

  test("categoricalDrift TV distance halves the delta sum") {
    val a = Seq("p", "p", "q").toDF("c")
    val b = Seq("p", "q", "q").toDF("c")
    val deltas = Drift.categoricalDrift(a, b, "c")
      .agg(sum("delta")).as[Double].collect().head
    // shares move 2/3<->1/3 on both categories: TV = 1/3, sum = 2/3
    assert(math.abs(deltas - 2.0 / 3.0) < 1e-15)
  }

  test("centroidDrift: per-dim fixed-point mean deltas, one-sided labels drop") {
    val a = Seq(
      (1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(9.0f, 9.0f), 7) // label 7 absent from b -> dropped
    ).toDF("vec_id", "embedding", "label")
    val b = Seq((4L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Drift.centroidDrift(a, b).orderBy("label", "d").collect()
    assert(out.length == 2)
    // label 0 means: a = [2,3], b = [0,1] -> delta [2,2]
    assert(out.map(_.getAs[Double]("delta")).toSeq == Seq(2.0, 2.0))
    assert(out.map(_.getAs[Long]("n_a")).toSeq == Seq(2L, 2L))
    assert(out.map(_.getAs[Long]("n_b")).toSeq == Seq(1L, 1L))
  }

  test("centroidDrift is order-insensitive (fixed-point sums)") {
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(8)(j => (math.sin(i * 8 + j) * 3).toFloat),
        i % 3)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val (ea, eb) = (df.where($"vec_id" % 2 === 0), df.where($"vec_id" % 2 === 1))
    val r1 = Drift.centroidDrift(ea, eb).orderBy("label", "d").collect().toSeq
    val r2 = Drift.centroidDrift(ea.repartition(13), eb.repartition(5))
      .orderBy("label", "d").collect().toSeq
    assert(r1 == r2)
  }

  test("meanPermutationTest: separated means significant, same-pool not, deterministic") {
    // A and B drawn from the same 1..40 pool: the observed diff is
    // relabeling noise -> p far from significant
    val pool = (1L to 40L).map(i => (i, (i % 10).toDouble))
    val (pa, pb) = pool.partition(_._1 % 2 == 0)
    val same = Drift.meanPermutationTest(
      pa.toDF("id", "v"), pb.toDF("id", "v"), "id", "v", nPerms = 99)
      .collect().head
    assert(same.getDouble(7) > 0.2, s"same-pool p=${same.getDouble(7)}")
    // disjoint value ranges: no relabeling reproduces the gap
    val far = Drift.meanPermutationTest(
      (1L to 30L).map(i => (i, 100.0 + i)).toDF("id", "v"),
      (1L to 30L).map(i => (i, 1.0 + i)).toDF("id", "v"),
      "id", "v", nPerms = 99).collect().head
    assert(far.getDouble(7) <= 0.05, s"separated p=${far.getDouble(7)}")
    assert(far.getLong(0) == 30L && far.getLong(1) == 30L)
    assert(far.getDouble(4) == 99.0) // diff = mean_a - mean_b exactly
    // pure function of (ids, values, salt): layout cannot change it
    val again = Drift.meanPermutationTest(
      pa.toDF("id", "v").repartition(7),
      pb.toDF("id", "v").repartition(3), "id", "v", nPerms = 99)
      .collect().head
    assert(again.toString == same.toString)
    graft.util.Caches.unpersistAll()
  }

  test("cuped: exact theta on a noiseless linear baseline, adjustment " +
      "removes pre-period imbalance, layout-invariant") {
    // y = 2x exactly, arm a handed the HIGH-baseline users (x 11..20),
    // arm b the low ones (x 1..10): the raw post-period means differ by
    // 20 purely through baseline imbalance the treatment never caused
    val units = ((1 to 10).map(i => ("b", i.toDouble, 2.0 * i)) ++
      (11 to 20).map(i => ("a", i.toDouble, 2.0 * i)))
      .toDF("grp", "x", "y")
    val r = Drift.cuped(units, "grp", "x", "y").orderBy("group").collect()
    val (a, b) = (r(0), r(1))
    assert(a.getString(0) == "a" && b.getString(0) == "b")
    assert(a.getLong(1) == 10L && b.getLong(1) == 10L)
    // pooled theta = cov(x, 2x)/var(x) = 2 exactly
    assert(a.getDouble(5) == 2.0)
    assert(a.getDouble(3) - b.getDouble(3) == 20.0, "raw diff = imbalance")
    // adjusted means: y - 2(x - 10.5) = 21 for EVERY unit in both arms
    assert(a.getDouble(4) == 21.0 && b.getDouble(4) == 21.0)
    // zero pre-period variance: theta falls back to 0, adjustment no-ops
    val flat = Drift.cuped(
      Seq(("a", 1.0, 5.0), ("b", 1.0, 7.0)).toDF("grp", "x", "y"),
      "grp", "x", "y").orderBy("group").collect()
    assert(flat(0).getDouble(5) == 0.0)
    assert(flat(0).getDouble(4) == flat(0).getDouble(3))
    // fixed-point sums: layout cannot move any reported digit
    val again = Drift.cuped(units.repartition(13), "grp", "x", "y")
      .orderBy("group").collect()
    assert(again.map(_.toString).toSeq == r.map(_.toString).toSeq)
  }

  test("srmCheck: balanced arms give chi2 = 0 and no flag") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("arm")
    val r = Drift.srmCheck(df, "arm", Map("a" -> 1.0, "b" -> 1.0), 3.841)
      .orderBy("group").collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Double]("expected_n") == 50.0))
    assert(r.forall(_.getAs[Double]("chi2") == 0.0))
    assert(r.forall(_.getAs[Long]("dof") == 1L))
    assert(r.forall(!_.getAs[Boolean]("srm")))
  }

  test("srmCheck: hand-computed mismatch trips the flag") {
    // 80/20 on a designed 1:1 -> e = 50, term = 900/50 = 18 each,
    // chi2 = 36 > 3.841
    val df = (Seq.fill(80)("a") ++ Seq.fill(20)("b")).toDF("arm")
    val r = Drift.srmCheck(df, "arm", Map("a" -> 1.0, "b" -> 1.0), 3.841)
      .orderBy("group").collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(80L, 20L))
    assert(r.forall(_.getAs[Double]("chi2_term") == 18.0))
    assert(r.forall(_.getAs[Double]("chi2") == 36.0))
    assert(r.forall(_.getAs[Boolean]("srm")))
    // weights normalize: {2, 2} is the same 1:1 design
    val r2 = Drift.srmCheck(df, "arm", Map("a" -> 2.0, "b" -> 2.0), 3.841)
      .orderBy("group").collect()
    assert(r2.map(_.toString).toSeq == r.map(_.toString).toSeq)
  }

  test("srmCheck: a vanished designed arm still gets a row") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(10)("b")).toDF("arm")
    val r = Drift
      .srmCheck(df, "arm", Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 3.841)
      .orderBy("group").collect()
    assert(r.length == 3)
    val c = r.find(_.getAs[String]("group") == "c").get
    assert(c.getAs[Long]("n") == 0L)
    // e = 20/3; terms = 2 * (10-e)^2/e + e = 10 (up to the 2^-20
    // fixed-point grid: each third rounds up, so 10.000001)
    assert(c.getAs[Double]("expected_n") == 6.666667)
    assert(math.abs(r.head.getAs[Double]("chi2") - 10.0) < 1e-5)
    assert(r.head.getAs[Long]("dof") == 2L)
    assert(r.forall(_.getAs[Boolean]("srm")))
  }

  test("srmCheck: an observed arm missing from the design trips srm") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(1)("zz"))
      .toDF("arm")
    val r = Drift.srmCheck(df, "arm", Map("a" -> 1.0, "b" -> 1.0), 100.0)
      .orderBy("group").collect()
    assert(r.length == 3)
    val z = r.find(_.getAs[String]("group") == "zz").get
    assert(z.isNullAt(z.fieldIndex("expected_n")))
    assert(z.isNullAt(z.fieldIndex("chi2_term")))
    // chi2 itself is small (threshold 100) - the undesigned arm alone flags
    assert(r.forall(_.getAs[Boolean]("srm")))
  }

  test("srmCheck: a zero-row input trips srm, never passes silently") {
    // The failure mode the guard exists for: an experiment that logged
    // NO units. Every (n-e)^2/e term would be 0/0; the guard must flag,
    // not fold the NaNs to chi2=0 and pass.
    val empty = Seq.empty[String].toDF("arm")
    val r = Drift.srmCheck(empty, "arm", Map("a" -> 1.0, "b" -> 1.0), 3.841)
      .orderBy("group").collect()
    assert(r.length == 2, "every designed arm still gets a row")
    assert(r.forall(_.getAs[Long]("n") == 0L))
    assert(r.forall(row => row.isNullAt(row.fieldIndex("chi2"))))
    assert(r.forall(_.getAs[Boolean]("srm")), "zero units must flag srm")
    // all-NULL groupCol is the same zero-total case
    val allNull = Seq.fill(5)(Option.empty[String]).toDF("arm")
    val r2 = Drift.srmCheck(allNull, "arm", Map("a" -> 1.0, "b" -> 1.0),
      3.841).collect()
    assert(r2.forall(_.getAs[Boolean]("srm")))
  }

  test("meanPermutationTest relabeling rate is uniform (pre-modulo draw)") {
    // The h32 % P domain over-weights values below 2^32-4P by 25%; the
    // raw 32-bit draw must realize the design rate. Check a 1:9 design:
    // P(A) must come out ~0.10, not the folded ~0.116.
    import graft.functions.{TextFunctions => T}
    val n = 20000L
    val nA = 2000L
    val thr = (BigInt(nA) * BigInt(2).pow(32) / BigInt(n)).toLong
    val rate = spark.range(0, n)
      .select((T.h32raw(concat(lit("u"), col("id"))) < thr)
        .cast("long").as("a"))
      .agg((sum("a") / n.toDouble).as("r")).collect().head.getDouble(0)
    assert(math.abs(rate - 0.10) < 0.01,
      s"realized A-rate $rate should be ~0.10 (pre-modulo uniform draw)")
  }

  test("bootstrapMeanCI: CI brackets the mean, tightens with n, " +
      "deterministic and layout-invariant") {
    val small = (1L to 30L).map(i => (i, (i % 10).toDouble)).toDF("id", "v")
    val big = (1L to 600L).map(i => (i, (i % 10).toDouble)).toDF("id", "v")
    val s = Drift.bootstrapMeanCI(small, "id", "v", nBoot = 99)
      .collect().head
    val b = Drift.bootstrapMeanCI(big, "id", "v", nBoot = 99)
      .collect().head
    for (r <- Seq(s, b)) {
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean")
        && r.getAs[Double]("mean") <= r.getAs[Double]("ci_hi"), r.toString)
      assert(r.getAs[Long]("n_boot") == 99L)
    }
    val widthS = s.getAs[Double]("ci_hi") - s.getAs[Double]("ci_lo")
    val widthB = b.getAs[Double]("ci_hi") - b.getAs[Double]("ci_lo")
    assert(widthB < widthS,
      s"20x the data must tighten the CI: $widthB vs $widthS")
    // pure function of (ids, values, salt)
    val again = Drift.bootstrapMeanCI(small.repartition(7), "id", "v",
      nBoot = 99).collect().head
    assert(again.toString == s.toString)
    // a fresh salt redraws the family (different CI endpoints)
    val salted = Drift.bootstrapMeanCI(small, "id", "v", nBoot = 99,
      salt = "x").collect().head
    assert(salted.toString != s.toString)
    graft.util.Caches.unpersistAll()
  }

  test("ksTest: identical distributions insignificant, disjoint ranges " +
      "p ~ 0, p matches the hand-evaluated Kolmogorov series") {
    val a = (1 to 120).map(i => (i % 20).toDouble).toDF("v")
    val b = (1 to 150).map(i => (i % 20).toDouble).toDF("v")
    val same = Drift.ksTest(a, b, "v").collect().head
    assert(same.getAs[Double]("p_value") > 0.5,
      s"same distribution p=${same.getAs[Double]("p_value")}")
    val far = Drift.ksTest(
      (1 to 60).map(_.toDouble + 1000).toDF("v"),
      (1 to 60).map(_.toDouble).toDF("v"), "v").collect().head
    assert(far.getAs[Double]("d") == 1.0
      && far.getAs[Double]("p_value") == 0.0, far.toString)
    // hand-evaluate the pinned series at the observed lambda
    val lamRow = Drift.ksTest(a, b, "v").collect().head
    val d = lamRow.getAs[Double]("d")
    val (na, nb) = (lamRow.getAs[Long]("n_a"), lamRow.getAs[Long]("n_b"))
    val l = d * math.sqrt(na.toDouble * nb / (na + nb))
    val series = (1 to 100).map(k =>
      (if (k % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * k * k * l * l)).sum
    val want = if (l < 0.04) 1.0
      else BigDecimal(math.min(1.0, math.max(0.0, 2 * series)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(lamRow.getAs[Double]("p_value") == want,
      s"p ${lamRow.getAs[Double]("p_value")} vs series $want")
    graft.util.Caches.unpersistAll()
  }

  test("kruskalWallis: hand-computed H on a tie-free 2-group example; " +
      "odd dof now gets the erfc-series p (round 16)") {
    // A = {1,2}, B = {3,4}: joint ranks 1..4, R_A = 3, R_B = 7,
    // H = 12/(4·5)·(3²/2 + 7²/2) − 3·5 = 0.6·29 − 15 = 2.4; no ties.
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val rows = Drift.kruskalWallis(df, "g", "v").orderBy("grp").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(3.0, 7.0))
    assert(rows.head.getAs[Double]("h") == 2.4)
    assert(rows.head.getAs[Long]("dof") == 1L)
    // dof 1: Q(2.4; 1) = erfc(√1.2) — exact value 0.121335 (the old
    // erf-free convention emitted NULL here; round 16 ships the p)
    assert(rows.head.getAs[Double]("p_value") ==
      graft.functions.PValues.round6(
        graft.functions.PValues.chiSqSurvival(2.4, 1)))
    assert(math.abs(rows.head.getAs[Double]("p_value") - 0.121335) < 1e-6)
    graft.util.Caches.unpersistAll()
  }

  test("kruskalWallis matches a brute midrank reference with ties, " +
      "3 groups give the dof=2 closed-form p, layout-invariant") {
    val data = Seq(
      "A" -> Seq(1.0, 2.0, 2.0, 5.0, 7.0, 9.0),
      "B" -> Seq(2.0, 3.0, 5.0, 5.0, 8.0),
      "C" -> Seq(4.0, 5.0, 6.0, 6.0, 9.0, 9.0, 11.0))
    val flat = data.flatMap { case (g, vs) => vs.map(g -> _) }
    // brute reference: average ranks over the sorted joint sample
    val all = flat.map(_._2).sorted
    def midrank(v: Double): Double = {
      val lo = all.indexOf(v)
      val hi = all.lastIndexOf(v)
      (lo + 1 + hi + 1) / 2.0
    }
    val n = all.size.toDouble
    val s = data.map { case (_, vs) =>
      val r = vs.map(midrank).sum
      r * r / vs.size
    }.sum
    val h0 = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    val ties = all.groupBy(identity).values.map(_.size.toDouble)
      .map(t => t * t * t - t).sum
    val hRef = h0 / (1.0 - ties / (n * n * n - n))
    val pRef = math.exp(-hRef / 2.0) // dof = 2 closed form

    val rows = Drift.kruskalWallis(flat.toDF("g", "v"), "g", "v")
      .orderBy("grp").collect()
    val h = rows.head.getAs[Double]("h")
    assert(math.abs(h - hRef) < 1e-6, s"H $h vs brute $hRef")
    assert(rows.head.getAs[Long]("dof") == 2L)
    assert(math.abs(rows.head.getAs[Double]("p_value") - pRef) < 1e-6)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 6L), ("B", 5L), ("C", 7L)))
    // joint rank sums partition N(N+1)/2
    assert(rows.map(_.getDouble(2)).sum == n * (n + 1) / 2.0)
    val rep = Drift.kruskalWallis(
      flat.toDF("g", "v").repartition(7), "g", "v").orderBy("grp").collect()
    assert(rep.toSeq.toString == rows.toSeq.toString,
      "result must not depend on input partitioning")
    graft.util.Caches.unpersistAll()
  }

  test("anovaF matches a brute-force reference; identical groups give " +
      "F = 0; grouping that explains everything gives eta_sq -> 1") {
    val data = Seq("A" -> Seq(1.0, 2.0, 3.0), "B" -> Seq(2.0, 4.0, 6.0),
      "C" -> Seq(8.0, 10.0))
    val flat = data.flatMap { case (g, vs) => vs.map(g -> _) }
    val n = flat.size.toDouble
    val grand = flat.map(_._2).sum / n
    val ssb = data.map { case (_, vs) =>
      val m = vs.sum / vs.size
      vs.size * (m - grand) * (m - grand)
    }.sum
    val ssw = data.flatMap { case (_, vs) =>
      val m = vs.sum / vs.size
      vs.map(v => (v - m) * (v - m))
    }.sum
    val fRef = (ssb / 2.0) / (ssw / (n - 3.0))
    val rows = Drift.anovaF(flat.toDF("g", "v"), "g", "v")
      .orderBy("grp").collect()
    assert(math.abs(rows.head.getAs[Double]("f") - fRef) < 1e-6,
      s"F ${rows.head.getAs[Double]("f")} vs brute $fRef")
    assert(rows.head.getAs[Long]("dof1") == 2L
      && rows.head.getAs[Long]("dof2") == 5L)
    assert(math.abs(rows.head.getAs[Double]("eta_sq")
      - ssb / (ssb + ssw)) < 1e-6)
    assert(rows.map(r => (r.getString(0), r.getAs[Double]("mean"))).toSeq
      == Seq(("A", 2.0), ("B", 4.0), ("C", 9.0)))
    // round 17: F survival p from the pinned incomplete-beta kernel,
    // checked against the brute F through the same kernel (the kernel
    // itself is pinned against 50-digit mpmath in PValuesSpec)
    assert(math.abs(rows.head.getAs[Double]("p_value")
      - PValues.fSurvival(fRef, 2.0, 5.0)) < 1e-5)
    // same distribution in every arm: F = 0 (all group means equal)
    val flat0 = Seq("A", "B").flatMap(g => Seq(1.0, 3.0).map(g -> _))
    val r0 = Drift.anovaF(flat0.toDF("g", "v"), "g", "v").collect().head
    assert(r0.getAs[Double]("f") == 0.0)
    assert(r0.getAs[Double]("p_value") == 1.0) // F = 0 -> p = 1 exactly
    graft.util.Caches.unpersistAll()
  }

  test("welchT matches a brute-force reference and mirrors under swap") {
    val a = Seq(27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1)
    val b = Seq(27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8)
    def mv(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val (ma, va) = mv(a); val (mb, vb) = mv(b)
    val se2 = va / a.size + vb / b.size
    val tRef = (ma - mb) / math.sqrt(se2)
    val dofRef = se2 * se2 /
      ((va / a.size) * (va / a.size) / (a.size - 1)
        + (vb / b.size) * (vb / b.size) / (b.size - 1))
    val r = Drift.welchT(a.toDF("value"), b.toDF("value"), "value")
      .collect().head
    assert(math.abs(r.getAs[Double]("t") - tRef) < 1e-5,
      s"t ${r.getAs[Double]("t")} vs brute $tRef")
    assert(math.abs(r.getAs[Double]("dof") - dofRef) < 1e-5)
    val sw = Drift.welchT(b.toDF("value"), a.toDF("value"), "value")
      .collect().head
    assert(math.abs(sw.getAs[Double]("t") + r.getAs[Double]("t")) < 1e-9,
      "swapping sides must mirror t")
    // round 17: exact Student-t p at the fractional Welch dof — in the
    // tiny-per-arm regime it must sit ABOVE the anti-conservative
    // normal approximation (fatter tails), and mirror under swap
    assert(r.getAs[Double]("p_t") > r.getAs[Double]("p_normal"),
      s"p_t ${r.getAs[Double]("p_t")} must exceed " +
        s"p_normal ${r.getAs[Double]("p_normal")} at n = 8 vs 7")
    assert(r.getAs[Double]("p_t") == sw.getAs[Double]("p_t"))
    assert(math.abs(r.getAs[Double]("p_t")
      - PValues.pStudentT2(tRef, dofRef)) < 1e-5)
    graft.util.Caches.unpersistAll()
  }

  test("brownForsythe: equal-spread arms score near 0, a wide arm is " +
      "detected; medians and mean absolute deviations are exact") {
    val tight = Seq("A" -> Seq(1.0, 2.0, 3.0), "B" -> Seq(11.0, 12.0, 13.0))
    val ft = Drift.brownForsythe(
      tight.flatMap { case (g, vs) => vs.map(g -> _) }.toDF("g", "v"),
      "g", "v").collect().head.getAs[Double]("f")
    assert(ft == 0.0, s"identical spreads must give F = 0, got $ft")
    val mixed = Seq("A" -> Seq(1.0, 2.0, 3.0, 2.0, 1.0),
      "B" -> Seq(-40.0, 0.0, 40.0, -40.0, 40.0))
    val rows = Drift.brownForsythe(
      mixed.flatMap { case (g, vs) => vs.map(g -> _) }.toDF("g", "v"),
      "g", "v").orderBy("grp").collect()
    assert(rows.head.getAs[Double]("f") > 10.0,
      s"10x spread difference must score, got ${rows.head.getAs[Double]("f")}")
    assert(rows.map(_.getAs[Double]("median")).toSeq == Seq(2.0, 0.0))
    // A: |x-2| = 1,0,1,0,1 -> 0.6; B: |x| = 40,0,40,40,40 -> 32
    assert(rows.map(_.getAs[Double]("mean_absdev")).toSeq == Seq(0.6, 32.0))
    // round 17: F survival p rides along — decisive on the 10x spread
    assert(rows.head.getAs[Double]("p_value") < 0.05)
    graft.util.Caches.unpersistAll()
  }

  test("mutualInformation: perfect association gives MI = H and NMI = 1, " +
      "independence gives 0; NULL is its own level") {
    val perfect = Seq(("a", "x"), ("b", "y"), ("a", "x"), ("b", "y"),
      ("c", "z"), ("c", "z")).toDF("u", "v")
    val p = Drift.mutualInformation(perfect, "u", "v").collect().head
    // H = -3*(1/3)ln(1/3) = ln 3 = 1.098612
    assert(p.getAs[Double]("mi") == p.getAs[Double]("h_x"))
    assert(math.abs(p.getAs[Double]("mi") - math.log(3.0)) < 1e-5)
    assert(p.getAs[Double]("nmi") == 1.0)
    val indep = (for (u <- Seq("a", "b"); v <- Seq("x", "y"); _ <- 1 to 5)
      yield (u, v)).toDF("u", "v")
    val i = Drift.mutualInformation(indep, "u", "v").collect().head
    assert(i.getAs[Double]("mi") == 0.0 && i.getAs[Double]("nmi") == 0.0)
    val withNull = Seq(("a", "x"), (null, "y")).toDF("u", "v")
    assert(Drift.mutualInformation(withNull, "u", "v")
      .collect().head.getAs[Long]("n_x") == 2L,
      "NULL must count as its own category level")
    graft.util.Caches.unpersistAll()
  }

  test("psi: identical snapshots score 0, a shifted snapshot scores " +
      "big; reference bins are equal-population") {
    val a = (1 to 1000).map(_.toDouble).toDF("v")
    val same = Drift.psi(a, a, "v", nBins = 10).orderBy("bin").collect()
    assert(same.length == 10)
    assert(same.head.getAs[Double]("psi") == 0.0)
    // reference quantile bins: each holds ~100 of the 1000 rows
    assert(same.forall(r => math.abs(r.getAs[Long]("n_a") - 100L) <= 1))
    // monotone bounds, open ends
    assert(same.head.getAs[Double]("lo").isNegInfinity)
    assert(same.last.getAs[Double]("hi").isPosInfinity)
    val shifted = Drift.psi(a,
      (1 to 1000).map(_.toDouble + 500).toDF("v"), "v", nBins = 10)
      .collect().head.getAs[Double]("psi")
    assert(shifted > 0.25, s"a half-range shift must alarm, got $shifted")
    graft.util.Caches.unpersistAll()
  }

  test("jensenShannon: identical mixes 0, disjoint mixes ln 2 " +
      "(norm = 1), asymmetric case matches brute") {
    val a = Seq("x", "x", "y").toDF("c")
    assert(Drift.jensenShannon(a, a, "c").collect().head
      .getAs[Double]("jsd") == 0.0)
    val dis = Drift.jensenShannon(a, Seq("z", "w").toDF("c"), "c")
      .collect().head
    assert(math.abs(dis.getAs[Double]("jsd") - math.log(2.0)) < 1e-5)
    assert(dis.getAs[Double]("jsd_norm") == 1.0)
    // brute: p = (2/3, 1/3, 0), q = (1/2, 0, 1/2)
    val b = Seq("x", "z").toDF("c")
    def kl(p: Seq[Double], m: Seq[Double]) = p.zip(m)
      .filter(_._1 > 0).map { case (pi, mi) => pi * math.log(pi / mi) }.sum
    val (p, q) = (Seq(2.0 / 3, 1.0 / 3, 0.0), Seq(0.5, 0.0, 0.5))
    val mm = p.zip(q).map { case (x, y) => (x + y) / 2 }
    val want = (kl(p, mm) + kl(q, mm)) / 2
    val got = Drift.jensenShannon(a, b, "c").collect().head
    assert(math.abs(got.getAs[Double]("jsd") - want) < 1e-5,
      s"${got.getAs[Double]("jsd")} vs brute $want")
    assert(got.getAs[Long]("n_categories") == 3L)
    graft.util.Caches.unpersistAll()
  }

  test("wasserstein1: a uniform shift scores exactly the shift; " +
      "identical snapshots 0; layout-invariant") {
    val a = Seq(0.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(5.0, 6.0, 7.0, 8.0).toDF("v")
    val r = Drift.wasserstein1(a, b, "v").collect().head
    assert(r.getAs[Double]("w1") == 5.0, r.toString)
    assert(r.getAs[Long]("n_values") == 8L)
    assert(Drift.wasserstein1(a, a, "v").collect().head
      .getAs[Double]("w1") == 0.0)
    // unequal sizes + ties still exact: a={0,0,10}, b={5};
    // F_A-F_B: on [0,5): |2/3-0|=2/3 -> 10/3; on [5,10): |2/3-1|=1/3
    // -> 5/3; total 5
    val r2 = Drift.wasserstein1(Seq(0.0, 0.0, 10.0).toDF("v"),
      Seq(5.0).toDF("v"), "v").collect().head
    assert(r2.getAs[Double]("w1") == 5.0, r2.toString)
    val big = (1 to 5000).map(i => (i % 97).toDouble).toDF("v")
    val big2 = (1 to 4000).map(i => (i % 89).toDouble + 3).toDF("v")
    val base = Drift.wasserstein1(big, big2, "v").collect().head
    val rep = Drift.wasserstein1(big.repartition(13),
      big2.repartition(7), "v").collect().head
    assert(base.toString == rep.toString,
      "result must not depend on input partitioning")
    graft.util.Caches.unpersistAll()
  }

  test("postStratified: stratum imbalance is corrected away when " +
      "within-stratum means agree; missing-stratum arm throws") {
    // stratum s1 pays 10, s2 pays 100 in BOTH arms; treatment is
    // over-exposed to s2, so the RAW means differ with no true effect
    val rows =
      Seq.fill(8)(("t", "s1", 10.0)) ++ Seq.fill(12)(("t", "s2", 100.0)) ++
      Seq.fill(12)(("c", "s1", 10.0)) ++ Seq.fill(8)(("c", "s2", 100.0))
    val out = Drift.postStratified(rows.toDF("arm", "seg", "v"),
      "arm", "seg", "v").orderBy("arm").collect()
    val c = out(0); val t = out(1)
    assert(c.getString(0) == "c" && t.getString(0) == "t")
    assert(t.getAs[Double]("mean") > c.getAs[Double]("mean"),
      "raw means must show the spurious imbalance effect")
    assert(t.getAs[Double]("mean_adj") == c.getAs[Double]("mean_adj"),
      s"adjusted means must agree: $t vs $c")
    // pooled shares: s1 = s2 = 20/40 -> adjusted = (10+100)/2 = 55
    assert(t.getAs[Double]("mean_adj") == 55.0)
    val ex = intercept[IllegalStateException] {
      Drift.postStratified(
        (rows :+ (("t", "s3", 1.0))).toDF("arm", "seg", "v"),
        "arm", "seg", "v").collect()
    }
    assert(ex.getMessage.contains("missing"), ex.getMessage)
    graft.util.Caches.unpersistAll()
  }

  test("ksTest: comparing a sample to itself pins p = 1 (degenerate " +
      "lambda = 0 regime, not the truncated-series 0)") {
    // at d = 0 every series term is +-1 and the truncated sum is 0 —
    // without the lambda < 0.04 short-circuit p would read 0.0
    // ("maximal significance" for IDENTICAL data); the pinned
    // convention returns the true p = 1.
    val a = (1 to 200).map(i => (i % 13).toDouble).toDF("v")
    val r = Drift.ksTest(a, a, "v").collect().head
    assert(r.getAs[Double]("d") == 0.0, r.toString)
    assert(r.getAs[Double]("lambda") == 0.0, r.toString)
    assert(r.getAs[Double]("p_value") == 1.0, r.toString)
    // just above the cut the series path is live again
    assert(Drift.ksTest(a,
        (1 to 200).map(i => (i % 13).toDouble + 100).toDF("v"), "v")
      .collect().head.getAs[Double]("p_value") == 0.0)
    graft.util.Caches.unpersistAll()
  }

  test("wilcoxonSignedRank: textbook ranks with ties and zero drops, " +
      "direction, symmetric null, layout-invariant") {
    // diffs: +1, -2, +3, +3, 0 -> zero drops (n=4); |d| ranks: 1->1,
    // 2->2, 3&3 -> midrank 3.5 each; W+ = 1 + 3.5 + 3.5 = 8, W- = 2
    val df = Seq((0.0, 1.0), (2.0, 0.0), (1.0, 4.0), (10.0, 13.0),
      (5.0, 5.0)).toDF("before", "after")
    val r = Drift.wilcoxonSignedRank(df, "before", "after").collect().head
    assert(r.getAs[Long]("n_pairs") == 5L && r.getAs[Long]("n_nonzero") == 4L)
    assert(r.getAs[Double]("w_plus") == 8.0 && r.getAs[Double]("w_minus") == 2.0,
      r.toString)
    assert(r.getAs[Double]("z") > 0)
    // swapped columns mirror W+ and W-
    val s = Drift.wilcoxonSignedRank(df, "after", "before").collect().head
    assert(s.getAs[Double]("w_plus") == 2.0 && s.getAs[Double]("w_minus") == 8.0)
    // perfectly symmetric diffs -> W+ = W- and z = 0
    val sym = Seq((0.0, 1.0), (1.0, 0.0), (0.0, 2.0), (2.0, 0.0))
      .toDF("before", "after")
    val t = Drift.wilcoxonSignedRank(sym, "before", "after").collect().head
    assert(t.getAs[Double]("w_plus") == t.getAs[Double]("w_minus"))
    assert(t.getAs[Double]("z") == 0.0)
    val big = (1 to 300).map(i =>
      ((i % 13).toDouble, (i % 13).toDouble + (i % 7) - 3))
      .toDF("before", "after")
    val b1 = Drift.wilcoxonSignedRank(big, "before", "after")
      .collect().head.toString
    val b2 = Drift.wilcoxonSignedRank(big.repartition(9), "before", "after")
      .collect().head.toString
    assert(b1 == b2)
    graft.util.Caches.unpersistAll()
  }

  test("spearman: monotone nonlinear = 1, reversed = -1, outlier-immune " +
      "vs Pearson, ties handled, layout-invariant") {
    // y = x^3: wildly nonlinear but perfectly monotone -> rho = 1
    val cube = (1 to 40).map(i => (i.toDouble, math.pow(i, 3))).toDF("x", "y")
    assert(Drift.spearman(cube, "x", "y").collect().head
      .getAs[Double]("rho") == 1.0)
    val anti = (1 to 40).map(i => (i.toDouble, -math.pow(i, 3))).toDF("x", "y")
    assert(Drift.spearman(anti, "x", "y").collect().head
      .getAs[Double]("rho") == -1.0)
    graft.util.Caches.unpersistAll()
    // one catastrophic outlier: Pearson collapses, rho barely moves
    val base = (1 to 50).map(i => (i.toDouble, i.toDouble + (i % 3)))
    val out = base :+ ((51.0, -1e9))
    val rho = Drift.spearman(out.toDF("x", "y"), "x", "y")
      .collect().head.getAs[Double]("rho")
    val pearson = Profile.correlation(
        out.map { case (a, b) => ("g", a, b) }.toDF("g", "x", "y"),
        "x", "y", Seq("g")).collect().head.getAs[Double]("corr")
    assert(rho > 0.85, s"rho $rho should shrug off one outlier")
    assert(pearson < 0.5, s"Pearson $pearson should collapse")
    graft.util.Caches.unpersistAll()
    // ties: constant y -> den 0 -> rho 0 by the correlation convention
    val flat = (1 to 10).map(i => (i.toDouble, 5.0)).toDF("x", "y")
    assert(Drift.spearman(flat, "x", "y").collect().head
      .getAs[Double]("rho") == 0.0)
    val t = (1 to 60).map(i => ((i % 7).toDouble, (i % 5).toDouble))
      .toDF("x", "y")
    val r1 = Drift.spearman(t, "x", "y").collect().head.toString
    val r2 = Drift.spearman(t.repartition(11), "x", "y")
      .collect().head.toString
    assert(r1 == r2)
    graft.util.Caches.unpersistAll()
  }

  test("chiSquareIndependence: hand-computed 2x2, independence ~ 0, " +
      "perfect association V=1, null level counted, layout-invariant") {
    // 2x2: (a,p)=30 (a,q)=10 (b,p)=10 (b,q)=30 -> margins 40/40, e=20
    // everywhere, chi2 = 4 * 100/20 = 20; V = sqrt(20/80) = 0.5
    val df = (Seq.fill(30)(("a", "p")) ++ Seq.fill(10)(("a", "q"))
      ++ Seq.fill(10)(("b", "p")) ++ Seq.fill(30)(("b", "q")))
      .toDF("x", "y")
    val r = Drift.chiSquareIndependence(df, "x", "y").collect().head
    assert(r.getAs[Double]("chi2") == 20.0, r.toString)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("cramers_v") == 0.5)
    // exact independence: counts proportional to margins -> chi2 = 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q", "r");
      _ <- 1 to (if (x == "a") 2 else 4)) yield (x, y)).toDF("x", "y")
    val ri = Drift.chiSquareIndependence(ind, "x", "y").collect().head
    assert(ri.getAs[Double]("chi2") == 0.0 && ri.getAs[Long]("dof") == 2L)
    // perfect association: x determines y -> V = 1
    val per = (Seq.fill(5)(("a", "p")) ++ Seq.fill(7)(("b", "q")))
      .toDF("x", "y")
    assert(Drift.chiSquareIndependence(per, "x", "y")
      .collect().head.getAs[Double]("cramers_v") == 1.0)
    // NULL is its own level, and layout cannot change anything
    val withNull = df.unionByName(
      Seq((null.asInstanceOf[String], "p")).toDF("x", "y"))
    val a1 = Drift.chiSquareIndependence(withNull, "x", "y")
      .collect().head
    assert(a1.getAs[Long]("n_rows_x") == 3L)
    val a2 = Drift.chiSquareIndependence(withNull.repartition(9), "x", "y")
      .collect().head
    assert(a2.toString == a1.toString)
    graft.util.Caches.unpersistAll()
  }

  test("mannWhitney: textbook U with ties, direction, degenerate z") {
    // A = {1,2,3}, B = {2,3,4}: for each a count b below (x2) + tied:
    // a=1: 0; a=2: 0*2+1=1; a=3: 1*2+1=3 -> 2U=4, U_A=2, U_B=9-2=7
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val r = Drift.mannWhitney(a, b, "v").collect().head
    assert(r.getAs[Double]("u_a") == 2.0 && r.getAs[Double]("u_b") == 7.0,
      r.toString)
    assert(r.getAs[Double]("z") < 0, "A stochastically below B -> z < 0")
    // swapped sides mirror: U_A' = 7
    val s = Drift.mannWhitney(b, a, "v").collect().head
    assert(s.getAs[Double]("u_a") == 7.0)
    assert(s.getAs[Double]("z") == -r.getAs[Double]("z") ||
      math.abs(s.getAs[Double]("z") + r.getAs[Double]("z")) < 1e-9)
    // all values identical: U = nA*nB/2, variance 0 -> z = 0 by pin
    val t = Drift.mannWhitney(
      Seq(5.0, 5.0).toDF("v"), Seq(5.0, 5.0, 5.0).toDF("v"), "v")
      .collect().head
    assert(t.getAs[Double]("u_a") == 3.0 && t.getAs[Double]("z") == 0.0)
    // layout invariance
    val big = (1 to 200).map(i => (i % 37).toDouble).toDF("v")
    val big2 = (1 to 150).map(i => (i % 23).toDouble + 0.5).toDF("v")
    val base = Drift.mannWhitney(big, big2, "v").collect().head.toString
    val again = Drift.mannWhitney(big.repartition(13),
      big2.repartition(7), "v").collect().head.toString
    assert(again == base)
    graft.util.Caches.unpersistAll()
  }

  test("bhAdjust: textbook step-up, including the rescued middle p") {
    // alpha=0.05, m=3 -> thresholds .0167/.0333/.05: p=0.03 FAILS its own
    // rank-2 threshold but rank 3 (p=0.04 <= .05) qualifies, so k*=3 and
    // ALL THREE reject — the property naive per-row thresholding misses
    val df = Seq((1L, 0.01), (2L, 0.03), (3L, 0.04)).toDF("id", "p")
    val r = Drift.bhAdjust(df, Seq("id"), "p").orderBy("id").collect()
    assert(r.map(_.getAs[Boolean]("reject")).forall(identity), r.mkString)
    assert(r.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    // classic mixed case: k*=3 of 5
    val df2 = Seq((1L, 0.01), (2L, 0.011), (3L, 0.021), (4L, 0.2),
      (5L, 0.9)).toDF("id", "p")
    val r2 = Drift.bhAdjust(df2, Seq("id"), "p").orderBy("id").collect()
    assert(r2.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, true, false, false), r2.mkString)
    graft.util.Caches.unpersistAll()
  }

  test("bhAdjust: none qualify -> none reject; NULL p excluded; " +
      "layout-invariant ranks under ties") {
    val none = Drift.bhAdjust(
      Seq((1L, 0.5), (2L, 0.9)).toDF("id", "p"), Seq("id"), "p").collect()
    assert(none.forall(!_.getAs[Boolean]("reject")))
    val withNull = Drift.bhAdjust(
      Seq((1L, Some(0.001)), (2L, None), (3L, Some(0.9)))
        .toDF("id", "p"), Seq("id"), "p").collect()
    assert(withNull.length == 2, "NULL p is 'not tested', no row")
    // ties on p rank deterministically by id, any layout
    val tied = Seq.tabulate(40)(i => ((i % 7).toLong * 100 + i, 0.001 * (i % 4)))
      .toDF("id", "p")
    val base = Drift.bhAdjust(tied, Seq("id"), "p")
      .orderBy("id").collect().map(_.toString).toSeq
    val again = Drift.bhAdjust(tied.repartition(11), Seq("id"), "p")
      .orderBy("id").collect().map(_.toString).toSeq
    assert(again == base)
    graft.util.Caches.unpersistAll()
  }

  test("srmCheck result is independent of input partitioning") {
    val df = spark.range(0, 997)
      .select(concat(lit("g"), (col("id") % 3).cast("string")).as("arm"))
    val base = Drift.srmCheck(df, "arm",
      Map("g0" -> 1.0, "g1" -> 1.0, "g2" -> 1.0), 5.991)
      .orderBy("group").collect()
    val again = Drift.srmCheck(df.repartition(17), "arm",
      Map("g0" -> 1.0, "g1" -> 1.0, "g2" -> 1.0), 5.991)
      .orderBy("group").collect()
    assert(again.map(_.toString).toSeq == base.map(_.toString).toSeq)
  }

  test("round-16 significance columns: mannWhitney p + Cliff's delta, " +
      "wilcoxon p, welch p_normal, srm chi2 p — all erfc-kernel exact") {
    import graft.functions.PValues
    // mannWhitney on disjoint ranges: A = {1,2,3}, B = {4,5,6} →
    // U_A = 0, z = (0 − 4.5)/√(9·7/12) = −4.5/2.2912878... and
    // δ = 2·0/(9) − 1 = −1 (A is stochastically dominated)
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 5.0, 6.0).toDF("v")
    val mw = Drift.mannWhitney(a, b, "v").collect().head
    assert(mw.getAs[Double]("delta") == -1.0)
    val zRaw = (0.0 - 4.5) / math.sqrt(9.0 * 7.0 / 12.0)
    assert(mw.getAs[Double]("p_value") ==
      PValues.round6(PValues.pTwoSidedZ(zRaw)))
    // symmetric: delta flips sign, p unchanged
    val mw2 = Drift.mannWhitney(b, a, "v").collect().head
    assert(mw2.getAs[Double]("delta") == 1.0)
    assert(mw2.getAs[Double]("p_value") == mw.getAs[Double]("p_value"))

    // wilcoxon: all-positive differences {1,2,3} (no ties, no zeros):
    // W+ = 6, mu = 3, var = 3·4·7/24 = 3.5, z = 3/√3.5
    val wx = Drift.wilcoxonSignedRank(
      Seq((0.0, 1.0), (0.0, 2.0), (0.0, 3.0)).toDF("before", "after"),
      "before", "after").collect().head
    assert(wx.getAs[Double]("w_plus") == 6.0)
    assert(wx.getAs[Double]("p_value") ==
      PValues.round6(PValues.pTwoSidedZ(3.0 / math.sqrt(3.5))))

    // welch: p_normal from the unrounded t, symmetric under swap
    val wa = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val wb = Seq(10.0, 12.0, 14.0, 16.0).toDF("v")
    val w1 = Drift.welchT(wa, wb, "v").collect().head
    val w2 = Drift.welchT(wb, wa, "v").collect().head
    assert(w1.getAs[Double]("p_normal") == w2.getAs[Double]("p_normal"))
    // |t| ≈ 7.3 → the true p is ~4e-13, which the 6dp reporting grid
    // renders as exactly 0.0 — decisively significant
    assert(w1.getAs[Double]("p_normal") == 0.0)
    // and a same-pool comparison is decisively NOT significant
    val w3 = Drift.welchT(wa, wa.withColumn("v", col("v") + lit(0.001)),
      "v").collect().head
    assert(w3.getAs[Double]("p_normal") > 0.9)

    // srm 80/20 vs designed 1:1: chi2 = 36 exactly (two terms of 18);
    // p = Q(36; 1) — and the balanced case reads p = 1 at 6dp
    val skew = (Seq.fill(80)("a") ++ Seq.fill(20)("b")).toDF("arm")
    val sr = Drift.srmCheck(skew, "arm", Map("a" -> 1.0, "b" -> 1.0),
      3.841).orderBy("group").collect().head
    assert(sr.getAs[Double]("chi2") == 36.0)
    assert(sr.getAs[Double]("p_value") ==
      PValues.round6(PValues.chiSqSurvival(36.0, 1)))
    val bal = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("arm")
    val b0 = Drift.srmCheck(bal, "arm", Map("a" -> 1.0, "b" -> 1.0),
      3.841).collect().head
    assert(b0.getAs[Double]("p_value") == 1.0)
  }

  test("proportionsZ: hand-computed pooled-SE z, lifts, degenerate " +
      "pins, missing arm throws") {
    import graft.functions.PValues
    def arms(ka: Int, na: Int, kb: Int, nb: Int) =
      ((0 until na).map(i => ("a", i < ka)) ++
        (0 until nb).map(i => ("b", i < kb))).toDF("arm", "s")
    // a: 4/10, b: 1/10 -> pool .25, se² = .25·.75·(0.2), z = .3/√.0375
    val r = Drift.proportionsZ(arms(4, 10, 1, 10), "arm", "s", "a", "b")
      .collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("k_a")) == ((10L, 4L)))
    assert(r.getAs[Double]("rate_a") == 0.4)
    assert(r.getAs[Double]("lift") == 0.3)
    assert(r.getAs[Double]("lift_rel") == 3.0) // (.4-.1)/.1
    val zExp = 0.3 / math.sqrt(0.25 * 0.75 * (1.0 / 10 + 1.0 / 10))
    assert(r.getAs[Double]("z") == PValues.round6(zExp))
    assert(r.getAs[Double]("p_value") ==
      PValues.round6(PValues.pTwoSidedZ(zExp)))
    // Wilson interval: brackets the rate, matches the pinned recompute
    def wilsonLo(p: Double, n: Double): Double = {
      val z = 1.959964
      val z2 = z * z
      val denom = 1.0 + z2 / n
      (p + z2 / (2.0 * n)) / denom -
        z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    }
    assert(r.getAs[Double]("ci_a_lo") == PValues.round6(wilsonLo(0.4, 10)))
    assert(r.getAs[Double]("ci_a_lo") < 0.4 && 0.4 < r.getAs[Double]("ci_a_hi"))
    assert(r.getAs[Double]("ci_b_lo") < 0.1 && 0.1 < r.getAs[Double]("ci_b_hi"))
    // Wilson stays honest at p-hat = 0 (Wald would collapse to [0, 0])
    val z00 = Drift.proportionsZ(arms(0, 10, 1, 10), "arm", "s", "a", "b")
      .collect().head
    assert(z00.getAs[Double]("ci_a_lo") == 0.0
      && z00.getAs[Double]("ci_a_hi") > 0.2)
    // swap arms: z flips sign, p unchanged
    val r2 = Drift.proportionsZ(arms(4, 10, 1, 10), "arm", "s", "b", "a")
      .collect().head
    assert(r2.getAs[Double]("z") == -r.getAs[Double]("z"))
    assert(r2.getAs[Double]("p_value") == r.getAs[Double]("p_value"))
    // degenerate pooled p ∈ {0,1}: no variance -> z = 0, p = 1
    val d0 = Drift.proportionsZ(arms(10, 10, 10, 10), "arm", "s", "a", "b")
      .collect().head
    assert(d0.getAs[Double]("z") == 0.0 && d0.getAs[Double]("p_value") == 1.0)
    // zero base rate: relative lift is NULL, absolute lift still reads
    val z0 = Drift.proportionsZ(arms(3, 10, 0, 10), "arm", "s", "a", "b")
      .collect().head
    assert(z0.isNullAt(z0.fieldIndex("lift_rel")))
    assert(z0.getAs[Double]("lift") == 0.3)
    // a named arm with no rows fails loudly
    val e = intercept[IllegalArgumentException](
      Drift.proportionsZ(arms(1, 5, 1, 5), "arm", "s", "a", "zzz"))
    assert(e.getMessage.contains("zzz"))
  }

  test("ksByGroup: per-group exact D with the hand example, identical " +
      "group pins p = 1, one-sided group NULL test, agrees with ksTest " +
      "on the single-group slice, layout-invariant") {
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 5.0), ("g2", 6.0), ("g3", 1.0)).toDF("g", "v")
    val b = Seq(("g1", 2.0), ("g1", 3.0), ("g1", 3.0), ("g1", 4.0),
      ("g2", 5.0), ("g2", 6.0)).toDF("g", "v")
    val out = Drift.ksByGroup(a, b, "g", "v").orderBy("grp").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("g1", "g2", "g3"))
    val g1 = out(0)
    // the ksStatistic hand example: cumA·4 − cumB·4 peaks at 8 on v = 2
    assert(g1.getAs[Double]("split_value") == 2.0)
    assert(g1.getAs[Double]("d_num") == 8.0)
    assert(g1.getAs[Double]("d") == 0.5)
    // the per-group row must agree with the whole-machinery ksTest run
    // on the same slice (same d, lambda, p)
    val single = Drift.ksTest(
      a.where(col("g") === "g1").select("v"),
      b.where(col("g") === "g1").select("v"), "v").collect().head
    assert(g1.getAs[Double]("d") == single.getAs[Double]("d"))
    assert(g1.getAs[Double]("lambda") == single.getAs[Double]("lambda"))
    assert(g1.getAs[Double]("p_value") == single.getAs[Double]("p_value"))
    // identical distributions: d = 0, ties resolve to the smallest
    // value, degenerate lambda pins p = 1
    val g2 = out(1)
    assert(g2.getAs[Double]("d") == 0.0)
    assert(g2.getAs[Double]("split_value") == 5.0)
    assert(g2.getAs[Double]("p_value") == 1.0)
    // one-sided group: row kept, test NULL
    val g3 = out(2)
    assert((g3.getAs[Long]("n_a"), g3.getAs[Long]("n_b")) == ((1L, 0L)))
    assert(g3.isNullAt(g3.fieldIndex("d")))
    assert(g3.isNullAt(g3.fieldIndex("p_value")))
    val rep = Drift.ksByGroup(a.repartition(7), b.repartition(5), "g", "v")
      .orderBy("grp").collect()
    assert(rep.map(_.toString).toSeq == out.map(_.toString).toSeq)
    graft.util.Caches.unpersistAll()
  }

  test("bootstrapLiftCI: CI brackets the exact lift and excludes 0 for " +
      "separated arms, straddles 0 for same-pool arms, deterministic " +
      "and layout-invariant") {
    val a = (1 to 200).map(i => (s"a$i", 10.0 + (i % 5))).toDF("id", "v")
    val b = (1 to 200).map(i => (s"b$i", 5.0 + (i % 5))).toDF("id", "v")
    val r = Drift.bootstrapLiftCI(a, b, "id", "v", nBoot = 100,
      salt = "t").collect().head
    assert(r.getAs[Double]("lift") == 5.0)
    assert(r.getAs[Double]("ci_lo") > 4.0 && r.getAs[Double]("ci_hi") < 6.0)
    assert(r.getAs[Double]("ci_lo") <= 5.0
      && 5.0 <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Long]("n_boot") <= 100L)
    val r2 = Drift.bootstrapLiftCI(a.repartition(7), b.repartition(3),
      "id", "v", nBoot = 100, salt = "t").collect().head
    assert(r2.toString == r.toString)
    // same pool re-id'd: lift exactly 0, the interval must straddle it
    val same = Drift.bootstrapLiftCI(a,
      a.withColumn("id", concat(lit("x"), col("id"))),
      "id", "v", nBoot = 100, salt = "t").collect().head
    assert(same.getAs[Double]("lift") == 0.0)
    assert(same.getAs[Double]("ci_lo") < 0
      && same.getAs[Double]("ci_hi") > 0)
  }

  test("wassersteinByGroup: uniform shift scores the shift per group, " +
      "identical group 0, single-value group 0, one-sided NULL, agrees " +
      "with wasserstein1 on the slice, layout-invariant") {
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 7.0), ("g2", 8.0),
      ("g3", 5.0), ("g4", 1.0), ("g4", 2.0)).toDF("g", "v")
    val b = Seq(("g1", 3.0), ("g1", 4.0), ("g2", 7.0), ("g2", 8.0),
      ("g3", 5.0)).toDF("g", "v")
    val out = Drift.wassersteinByGroup(a, b, "g", "v").orderBy("grp")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("g1", "g2", "g3", "g4"))
    // g1: every value shifted +2 -> W1 exactly 2
    assert(out(0).getAs[Double]("w1") == 2.0)
    val single = Drift.wasserstein1(
      a.where(col("g") === "g1").select("v"),
      b.where(col("g") === "g1").select("v"), "v").collect().head
    assert(out(0).getAs[Double]("w1") == single.getAs[Double]("w1"))
    // g2 identical -> 0; g3 single shared value -> 0 with n_values 1
    assert(out(1).getAs[Double]("w1") == 0.0)
    assert(out(2).getAs[Double]("w1") == 0.0)
    assert(out(2).getAs[Long]("n_values") == 1L)
    // g4 one-sided -> row kept, w1 NULL
    assert(out(3).getAs[Long]("n_b") == 0L)
    assert(out(3).isNullAt(out(3).fieldIndex("w1")))
    val rep = Drift.wassersteinByGroup(
      a.repartition(7), b.repartition(5), "g", "v").orderBy("grp")
      .collect()
    assert(rep.map(_.toString).toSeq == out.map(_.toString).toSeq)
    graft.util.Caches.unpersistAll()
  }

  test("welchBySegment: every segment row equals welchT on that slice " +
      "(in-plan ibeta == driver kernel); degenerate segments read NULL") {
    val rows = Seq(
      // s1: a real shift; s2: same pool; s3: arm b has ONE row (NULL)
      "s1" -> Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
        ("b", 10.0), ("b", 12.0), ("b", 14.0)),
      "s2" -> Seq(("a", 5.0), ("a", 6.0), ("a", 7.0),
        ("b", 5.5), ("b", 6.5), ("b", 7.5)),
      "s3" -> Seq(("a", 1.0), ("a", 2.0), ("b", 9.0)))
    val df = rows.flatMap { case (s, vs) =>
      vs.map { case (g, v) => (s, g, v) } }.toDF("seg", "arm", "v")
    val out = Drift.welchBySegment(df, "seg", "arm", "v", "a", "b")
      .orderBy("segment").collect()
    assert(out.length == 3)
    // per-segment == the driver-finished welchT on the same slice
    rows.take(2).foreach { case (s, vs) =>
      val a = vs.filter(_._1 == "a").map(_._2).toDF("v")
      val b = vs.filter(_._1 == "b").map(_._2).toDF("v")
      val single = Drift.welchT(a, b, "v").collect().head
      val seg = out.find(_.getString(0) == s).get
      Seq("mean_a", "mean_b", "var_a", "var_b", "t", "dof").foreach(c =>
        assert(seg.getAs[Double](c) == single.getAs[Double](c),
          s"$s.$c: ${seg.getAs[Double](c)} vs ${single.getAs[Double](c)}"))
      assert(seg.getAs[Double]("p_t") == single.getAs[Double]("p_t"),
        s"$s.p_t in-plan ibeta must equal the driver kernel")
    }
    // the shifted segment is decisive, the same-pool one is not
    assert(out.find(_.getString(0) == "s1").get.getAs[Double]("p_t") < 0.01)
    assert(out.find(_.getString(0) == "s2").get.getAs[Double]("p_t") > 0.5)
    // s3: arm b has 1 row -> no comparison, NULL t/dof/p (kept, loud)
    val s3 = out.find(_.getString(0) == "s3").get
    assert(s3.isNullAt(s3.fieldIndex("p_t")))
    assert(s3.isNullAt(s3.fieldIndex("t")))
    assert(s3.getAs[Double]("mean_a") == 1.5) // means still report
    graft.util.Caches.unpersistAll()
  }

  test("hodgesLehmann: textbook median-of-pairwise-differences, weight " +
      "handling, mirror/shift symmetry, loud pair guard") {
    def hl(a: Seq[Double], b: Seq[Double]) =
      Drift.hodgesLehmann(a.toDF("v"), b.toDF("v"), "v").collect().head
    // diffs of {6,7,8}x{1,2} = {4,5,5,6,6,7}: N=6, median=(5+6)/2=5.5;
    // at n=3x2 the Moses C exceeds N/2 so the CI is the full range
    val r = hl(Seq(6.0, 7.0, 8.0), Seq(1.0, 2.0))
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("hl_shift") == 5.5)
    assert(r.getAs[Double]("ci_lo") == 4.0 && r.getAs[Double]("ci_hi") == 7.0)
    // duplicate values weight the difference multiset: {1,1,2}x{0} ->
    // {1(x2), 2}: median = 1
    assert(hl(Seq(1.0, 1.0, 2.0), Seq(0.0)).getAs[Double]("hl_shift") == 1.0)
    // mirror: swapping sides negates shift and mirrors the CI
    val m = hl(Seq(1.0, 2.0), Seq(6.0, 7.0, 8.0))
    assert(m.getAs[Double]("hl_shift") == -5.5)
    assert(m.getAs[Double]("ci_lo") == -7.0 && m.getAs[Double]("ci_hi") == -4.0)
    // shift equivariance: hl(a + 10, b) = hl(a, b) + 10
    val s = hl(Seq(16.0, 17.0, 18.0), Seq(1.0, 2.0))
    assert(s.getAs[Double]("hl_shift") == 15.5)
    // a real-size case: CI must bracket the shift and tighten vs n=3x2
    val big = hl((0 until 300).map(i => 10.0 + i % 7),
      (0 until 300).map(i => 4.0 + i % 7))
    assert(big.getAs[Double]("hl_shift") == 6.0)
    assert(big.getAs[Double]("ci_lo") >= 5.0 &&
      big.getAs[Double]("ci_hi") <= 7.0)
    // loud guards
    intercept[IllegalArgumentException](
      Drift.hodgesLehmann((0 until 100).map(_.toDouble).toDF("v"),
        (0 until 100).map(_.toDouble).toDF("v"), "v", maxPairs = 10L))
    intercept[IllegalArgumentException](
      hl(Seq.empty[Double], Seq(1.0)))
    graft.util.Caches.unpersistAll()
  }

  test("sequentialMSPRT: always-valid p is non-increasing, stays high " +
      "under the null, crosses on a real lift, and recomputes from the " +
      "pinned closed form") {
    // 4 looks, 200 units per arm per look; arm A converts at 60%,
    // arm B at 30% — a lift the mixture SPRT must catch within looks
    def units(look: Int, arm: String, n: Int, k: Int) =
      (0 until n).map(i => (look.toLong, arm, i < k))
    val lifted = (0 until 4).flatMap(l =>
      units(l, "a", 200, 120) ++ units(l, "b", 200, 60))
      .toDF("look", "arm", "s")
    val out = Drift.sequentialMSPRT(lifted, "look", "arm", "s", "a", "b")
      .collect()
    assert(out.length == 4)
    val ps = out.map(_.getAs[Double]("p_seq")).toSeq
    assert(ps == ps.sorted.reverse, s"p_seq must be non-increasing: $ps")
    assert(ps.last <= 0.05 && out.last.getAs[Boolean]("reject"),
      s"a 2x conversion lift must reject, p_seq = $ps")
    // pinned recompute of look 0: Λ from the cumulative counts
    val ra = 120.0 / 200.0; val rb = 60.0 / 200.0
    val v = ra * (1.0 - ra) / 200.0 + rb * (1.0 - rb) / 200.0
    val theta = ra - rb
    val lam = math.sqrt(v / (v + 0.01)) *
      math.exp((theta * theta * 0.01) / (2.0 * v * (v + 0.01)))
    assert(out.head.getAs[Double]("p_seq") ==
      graft.functions.PValues.round6(math.min(1.0, 1.0 / lam)))
    // null: identical arms — p_seq must stay comfortably above alpha
    // at every look (the peeking guarantee)
    val nullCase = (0 until 4).flatMap(l =>
      units(l, "a", 200, 60) ++ units(l, "b", 200, 60))
      .toDF("look", "arm", "s")
    val np = Drift.sequentialMSPRT(nullCase, "look", "arm", "s", "a", "b")
      .collect().map(_.getAs[Double]("p_seq"))
    assert(np.forall(_ > 0.5), s"null case must not approach alpha: " +
      np.toSeq)
    // a look where an arm has NO CUMULATIVE data yet is NOT judged
    // (NULL p_seq, skipped by the running min); once the arm appears,
    // judging starts — and the guard params are loud
    val gappy = (units(0, "a", 50, 30) ++
      units(1, "a", 50, 30) ++ units(1, "b", 50, 15))
      .toDF("look", "arm", "s")
    val g = Drift.sequentialMSPRT(gappy, "look", "arm", "s", "a", "b")
      .collect()
    assert(g(0).isNullAt(g(0).fieldIndex("p_seq")))
    assert(g(0).isNullAt(g(0).fieldIndex("reject")))
    assert(!g(1).isNullAt(g(1).fieldIndex("p_seq")))
    intercept[IllegalArgumentException](
      Drift.sequentialMSPRT(gappy, "look", "arm", "s", "a", "a"))
    intercept[IllegalArgumentException](
      Drift.sequentialMSPRT(gappy, "look", "arm", "s", "a", "b",
        tauSq = 0.0))
    graft.util.Caches.unpersistAll()
  }

  test("sequentialMSPRTMean: catches a mean lift within looks, stays " +
      "high under the null, pinned closed-form recompute at look 0") {
    def units(look: Int, arm: String, vs: Seq[Double]) =
      vs.map(v => (look.toLong, arm, v))
    // arm a runs 2.0 above arm b with unit-ish spread; tau^2 = 1.0
    def wave(base: Double) =
      (0 until 50).map(i => base + (i % 5) * 0.5)
    val lifted = (0 until 4).flatMap(l =>
      units(l, "a", wave(12.0)) ++ units(l, "b", wave(10.0)))
      .toDF("look", "arm", "v")
    val out = Drift.sequentialMSPRTMean(lifted, "look", "arm", "v",
      "a", "b", tauSq = 1.0).collect()
    assert(out.length == 4)
    val ps = out.map(_.getAs[Double]("p_seq")).toSeq
    assert(ps == ps.sorted.reverse)
    assert(ps.last <= 0.05 && out.last.getAs[Boolean]("reject"),
      s"a 2-unit lift at per-look n=50 must reject, p_seq = $ps")
    assert(out.forall(_.getAs[Double]("lift") == 2.0))
    // pinned recompute at look 0 (exact doubles: the wave is 2^-1-grid)
    val xs = wave(12.0); val ys = wave(10.0)
    def mv(v: Seq[Double]) = {
      val m = v.sum / v.size
      (m, v.map(x => (x - m) * (x - m)).sum / (v.size - 1))
    }
    val (ma, va) = mv(xs); val (mb, vb) = mv(ys)
    val v0 = va / 50.0 + vb / 50.0
    val th = ma - mb
    val lam = math.sqrt(v0 / (v0 + 1.0)) *
      math.exp((th * th * 1.0) / (2.0 * v0 * (v0 + 1.0)))
    assert(math.abs(out.head.getAs[Double]("p_seq")
      - math.min(1.0, 1.0 / lam)) < 1e-5)
    // null: identical distributions never approach alpha
    val nullCase = (0 until 4).flatMap(l =>
      units(l, "a", wave(10.0)) ++ units(l, "b", wave(10.0)))
      .toDF("look", "arm", "v")
    val np = Drift.sequentialMSPRTMean(nullCase, "look", "arm", "v",
      "a", "b", tauSq = 1.0).collect().map(_.getAs[Double]("p_seq"))
    assert(np.forall(_ > 0.5), s"null case: $np")
    // single-row-arm looks are not judged
    val tiny = Seq((0L, "a", 1.0), (0L, "b", 2.0),
      (1L, "a", 1.5), (1L, "b", 2.5)).toDF("look", "arm", "v")
    val t0 = Drift.sequentialMSPRTMean(tiny, "look", "arm", "v",
      "a", "b").collect()
    assert(t0(0).isNullAt(t0(0).fieldIndex("p_seq")))
    assert(!t0(1).isNullAt(t0(1).fieldIndex("p_seq")))
    graft.util.Caches.unpersistAll()
  }

  test("proportionsBySegment: planted segment trips, null segment " +
      "reads p = 1, missing-arm segment gets NULL test; BH chain " +
      "rejects only the plant") {
    import graft.functions.PValues
    def rows(seg: String, arm: String, k: Int, n: Int) =
      (0 until n).map(i => (seg, arm, i < k))
    val df = (
      rows("s1", "a", 90, 100) ++ rows("s1", "b", 10, 100) ++ // plant
        rows("s2", "a", 50, 100) ++ rows("s2", "b", 50, 100) ++ // null
        rows("s3", "a", 5, 10) // missing arm b
      ).toDF("seg", "arm", "s")
    val per = Drift.proportionsBySegment(df, "seg", "arm", "s", "a", "b")
      .orderBy("segment").collect()
    assert(per.map(_.getString(0)).toSeq == Seq("s1", "s2", "s3"))
    val s1 = per(0)
    // pinned recompute: pool .5, se² = .25·(.02), z = .8/√.005
    val z1 = 0.8 / math.sqrt(0.5 * 0.5 * (1.0 / 100 + 1.0 / 100))
    assert(s1.getAs[Double]("z") == PValues.round6(z1))
    assert(s1.getAs[Double]("p_value") ==
      PValues.round6(PValues.pTwoSidedZ(z1)))
    val s2 = per(1)
    assert(s2.getAs[Double]("z") == 0.0)
    assert(s2.getAs[Double]("p_value") == 1.0)
    val s3 = per(2)
    assert(s3.getAs[Long]("n_b") == 0L)
    assert(s3.isNullAt(s3.fieldIndex("z")))
    assert(s3.isNullAt(s3.fieldIndex("p_value")))
    assert(s3.isNullAt(s3.fieldIndex("rate_b")))
    assert(s3.getAs[Double]("rate_a") == 0.5)
    // the FDR chain: only the plant survives BH at alpha .05 (m = 2
    // tested segments; s3's NULL p is excluded, not counted against m)
    val bh = Drift.bhAdjust(
      Drift.proportionsBySegment(df, "seg", "arm", "s", "a", "b"),
      Seq("segment"), "p_value", alpha = 0.05)
      .orderBy("segment").collect()
    assert(bh.length == 2)
    assert(bh.map(r => r.getString(0) -> r.getAs[Boolean]("reject"))
      .toMap == Map("s1" -> true, "s2" -> false))
  }

  test("fisherExact: the lady-tasting-tea 2x2 pins the textbook " +
      "two-sided p; transpose symmetry; the maxN guard is loud") {
    import graft.functions.PValues
    // a=3,b=1,c=1,d=3 (margins 4/4, n=8): pmf = {1,16,36,16,1}/70,
    // observed pmf 16/70 -> include k in {0,1,3,4} -> p = 34/70
    def table(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false)))
        .toDF("x", "y")
    val tea = Drift.fisherExact(table(3, 1, 1, 3), "x", "y")
      .collect().head
    assert(tea.getAs[Long]("n") == 8L)
    assert(math.abs(tea.getAs[Double]("p_value") - 34.0 / 70.0) < 1e-5)
    assert(tea.getAs[Double]("odds_ratio") == 9.0)
    // transposing the table (swap x/y) keeps margins' roles swapped but
    // the hypergeometric p identical
    val t2 = Drift.fisherExact(table(3, 1, 1, 3), "y", "x")
      .collect().head
    assert(t2.getAs[Double]("p_value") == tea.getAs[Double]("p_value"))
    // strong association: diagonal-only table -> tiny p; bc = 0 -> NULL
    // odds ratio
    val diag = Drift.fisherExact(table(6, 0, 0, 6), "x", "y")
      .collect().head
    assert(diag.getAs[Double]("p_value") < 0.01)
    assert(diag.isNullAt(diag.fieldIndex("odds_ratio")))
    // p_value is exactly the clamped-rounded driver kernel value:
    // independence-ish table reads p = 1
    val flat = Drift.fisherExact(table(2, 2, 2, 2), "x", "y")
      .collect().head
    assert(flat.getAs[Double]("p_value") == 1.0)
    // the guard: beyond maxN the test refuses loudly
    val e = intercept[IllegalArgumentException](
      Drift.fisherExact(table(3, 1, 1, 3), "x", "y", maxN = 4L))
    assert(e.getMessage.contains("chiSquareIndependence"))
  }

  test("round-16: chiSquareIndependence p_value — any dof, NULL on a " +
      "constant column (dof 0)") {
    // hand 2x2 from the existing hand-computed test data shape:
    // perfect association x == y over 2 levels -> chi2 = n, dof = 1
    val df = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val r = Drift.chiSquareIndependence(df, "x", "y").collect().head
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 4.0)
    assert(r.getAs[Double]("p_value") ==
      graft.functions.PValues.round6(
        graft.functions.PValues.chiSqSurvival(4.0, 1)))
    // constant y: dof = 0 -> no test, p NULL (and cramers_v NULL)
    val const = Seq(("a", "k"), ("b", "k"), ("a", "k")).toDF("x", "y")
    val rc = Drift.chiSquareIndependence(const, "x", "y").collect().head
    assert(rc.getAs[Long]("dof") == 0L)
    assert(rc.isNullAt(rc.fieldIndex("p_value")))
    assert(rc.isNullAt(rc.fieldIndex("cramers_v")))
  }

  test("ratioDelta: matches a brute delta-method reference on seeded " +
      "random units, partitioning-invariant") {
    val rnd = new scala.util.Random(1861)
    val units = (1 to 400).map { i =>
      val arm = if (i % 2 == 0) "g0" else "g1"
      val den = (1 + rnd.nextInt(20)).toDouble
      // numerator correlates with the denominator (the case the
      // covariance term exists for)
      val num = den * (0.5 + rnd.nextDouble()) + rnd.nextDouble() * 3.0
      (arm, math.round(num * 64d) / 64d, den) // dyadic -> fp-exact
    }
    val df = units.toDF("arm", "num", "den")
    val r = Drift.ratioDelta(df, "arm", "num", "den", "g0", "g1")
      .collect().head
    // brute reference: independent plain-Scala accumulation
    def brute(arm: String): (Long, Double, Double) = {
      val rows = units.filter(_._1 == arm)
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(u => u._2 * u._2).sum
      val syy = rows.map(u => u._3 * u._3).sum
      val sxy = rows.map(u => u._2 * u._3).sum
      val ratio = sx / sy
      val vxx = (sxx - sx * sx / n) / (n - 1)
      val vyy = (syy - sy * sy / n) / (n - 1)
      val vxy = (sxy - sx * sy / n) / (n - 1)
      val vr = (vxx - 2 * ratio * vxy + ratio * ratio * vyy) /
        (n * (sy / n) * (sy / n))
      (rows.length.toLong, ratio, vr)
    }
    val (na, ra, va) = brute("g0"); val (nb, rb, vb) = brute("g1")
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("ratio_a") - ra) < 1e-6)
    assert(math.abs(r.getAs[Double]("ratio_b") - rb) < 1e-6)
    val se = math.sqrt(va + vb)
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-6)
    assert(math.abs(r.getAs[Double]("z") - (ra - rb) / se) < 1e-4)
    // CI brackets the point estimate and is centered on it
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("diff"))
    assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("diff"))
    // partitioning invariance (exact fixed-point moments)
    val r2 = Drift.ratioDelta(df.repartition(7), "arm", "num", "den",
      "g0", "g1").collect().head
    assert(r == r2)
  }

  test("ratioDelta: exactly proportional units pin zero variance " +
      "(the covariance term at work); loud on missing arm / zero den") {
    // num = 3·den exactly on both arms: ignoring the covariance the
    // variance would be positive; the delta method cancels it to 0
    val df = (1 to 40).map { i =>
      val arm = if (i % 2 == 0) "g0" else "g1"
      val den = (1 + i % 7).toDouble
      (arm, 3.0 * den, den)
    }.toDF("arm", "num", "den")
    val r = Drift.ratioDelta(df, "arm", "num", "den", "g0", "g1")
      .collect().head
    assert(r.getAs[Double]("ratio_a") == 3.0)
    assert(r.getAs[Double]("ratio_b") == 3.0)
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
    intercept[IllegalArgumentException] {
      Drift.ratioDelta(df, "arm", "num", "den", "g0", "gX").collect()
    }
    val zeroDen = Seq(("g0", 1.0, 1.0), ("g0", 1.0, -1.0),
      ("g1", 1.0, 1.0), ("g1", 2.0, 1.0)).toDF("arm", "num", "den")
    intercept[IllegalArgumentException] {
      Drift.ratioDelta(zeroDen, "arm", "num", "den", "g0", "g1").collect()
    }
  }

  test("welchTost: shares welchT's diff/se/dof, mirrors under side " +
      "swap, and decides by margin size") {
    val rnd = new scala.util.Random(427)
    val a = (1 to 150).map(_ => 10.0 + rnd.nextGaussian()).toDF("v")
    val b = (1 to 170).map(_ => 10.3 + rnd.nextGaussian()).toDF("v")
    val wt = Drift.welchT(a, b, "v").collect().head
    val eq = Drift.welchTost(a, b, "v", margin = 5.0).collect().head
    // same machinery: diff = mean_a - mean_b, same dof
    assert(math.abs(eq.getAs[Double]("diff") -
      (wt.getAs[Double]("mean_a") - wt.getAs[Double]("mean_b"))) < 1e-9)
    assert(math.abs(eq.getAs[Double]("dof") -
      wt.getAs[Double]("dof")) < 1e-9)
    // a generous margin proves equivalence; a hair margin cannot
    assert(eq.getAs[Boolean]("equivalent"))
    assert(eq.getAs[Double]("p_tost") < 0.05)
    val tight = Drift.welchTost(a, b, "v", margin = 0.01).collect().head
    assert(!tight.getAs[Boolean]("equivalent"))
    // one-sided p recomputes from the (rounded) outputs through the
    // pinned kernel — tolerance covers the 6dp output rounding
    val P = graft.functions.PValues
    val tLoRe = (eq.getAs[Double]("diff") + 5.0) / eq.getAs[Double]("se")
    assert(math.abs(eq.getAs[Double]("p_lower") -
      P.pStudentTUpper(tLoRe, eq.getAs[Double]("dof"))) < 1e-4)
    // side swap mirrors the two bounds
    val sw = Drift.welchTost(b, a, "v", margin = 5.0).collect().head
    assert(math.abs(eq.getAs[Double]("t_lower") +
      sw.getAs[Double]("t_upper")) < 1e-6)
    assert(math.abs(eq.getAs[Double]("p_lower") -
      sw.getAs[Double]("p_upper")) < 2e-6)
  }

  test("welchTost: degenerate zero variance pins p = 1, not equivalent; " +
      "margin must be positive") {
    val a = Seq(5.0, 5.0, 5.0).toDF("v")
    val b = Seq(5.0, 5.0, 5.0).toDF("v")
    val r = Drift.welchTost(a, b, "v", margin = 1.0).collect().head
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.getAs[Double]("p_tost") == 1.0)
    assert(!r.getAs[Boolean]("equivalent"))
    intercept[IllegalArgumentException] {
      Drift.welchTost(a, b, "v", margin = 0.0)
    }
  }

  test("powerMde: recomputes from welchT moments, power grows with the " +
      "effect, redesign n reaches the target") {
    val rnd = new scala.util.Random(883)
    val a = (1 to 200).map(_ => 50.0 + 4.0 * rnd.nextGaussian()).toDF("v")
    val bSmall = (1 to 220).map(_ => 50.2 + 4.0 * rnd.nextGaussian())
      .toDF("v")
    val bBig = (1 to 220).map(_ => 53.0 + 4.0 * rnd.nextGaussian())
      .toDF("v")
    val rs = Drift.powerMde(a, bSmall, "v").collect().head
    val rb = Drift.powerMde(a, bBig, "v").collect().head
    // mde_abs = (z_{0.975} + z_{0.80})·se, both from the output row
    assert(math.abs(rs.getAs[Double]("mde_abs") -
      (1.959964 + 0.841621) * rs.getAs[Double]("se")) < 1e-5)
    // a bigger true effect -> more observed power
    assert(rb.getAs[Double]("power_observed") >
      rs.getAs[Double]("power_observed"))
    assert(rs.getAs[Double]("power_observed") >= 0.0 &&
      rb.getAs[Double]("power_observed") <= 1.0)
    // the redesign n makes the observed diff detectable: at n_req the
    // new se satisfies (zA+zP)·se(n) <= |diff| (within the ceil step)
    val nReq = rb.getAs[Long]("n_per_arm_required")
    assert(nReq > 0)
    val wt = Drift.welchT(a, bBig, "v").collect().head
    val vSum = wt.getAs[Double]("var_a") + wt.getAs[Double]("var_b")
    val seAt = math.sqrt(vSum / nReq.toDouble)
    assert((1.959964 + 0.841621) * seAt <=
      math.abs(rb.getAs[Double]("diff")) + 1e-6)
    // pinned-lookup guards: unsupported alpha / power are loud
    intercept[IllegalArgumentException] {
      Drift.powerMde(a, bBig, "v", alpha = 0.07)
    }
    intercept[IllegalArgumentException] {
      Drift.powerMde(a, bBig, "v", power = 0.85)
    }
    // zero pooled variance is loud (sensitivity over constants)
    val c = Seq(1.0, 1.0, 1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Drift.powerMde(c, c, "v").collect()
    }
  }

  test("yuenTrimmed: textbook 5-point example (g=1), boundary-tie " +
      "winsorization, guards") {
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Drift.yuenTrimmed(a, b, "v", trim = 0.2).collect().head
    // per side: g=1, h=3; trimmed means 3 and 4; winsorized sample
    // variance 1 -> d = 1·4/(3·2) = 2/3 each; t = -1/sqrt(4/3);
    // c = 1/2 -> dof = 1/(2·(1/4)/2) = 4
    assert(r.getAs[Long]("g_a") == 1L && r.getAs[Long]("h_a") == 3L)
    assert(r.getAs[Double]("tmean_a") == 3.0)
    assert(r.getAs[Double]("tmean_b") == 4.0)
    assert(math.abs(r.getAs[Double]("t") -
      (-1.0 / math.sqrt(4.0 / 3.0))) < 1e-6)
    assert(math.abs(r.getAs[Double]("dof") - 4.0) < 1e-9)
    // boundary ties: [1,2,2,2,5] trims to [2,2,2] (winsorized var 0)
    val ta = Seq(1.0, 2.0, 2.0, 2.0, 5.0).toDF("v")
    val rt = Drift.yuenTrimmed(ta, b, "v", trim = 0.2).collect().head
    assert(rt.getAs[Double]("tmean_a") == 2.0)
    // degenerate both-sides-constant-after-winsorizing pins p = 1
    val rc = Drift.yuenTrimmed(ta, ta, "v", trim = 0.2).collect().head
    assert(rc.getAs[Double]("se") == 0.0 &&
      rc.getAs[Double]("p_t") == 1.0)
    intercept[IllegalArgumentException] {
      Drift.yuenTrimmed(a, b, "v", trim = 0.6)
    }
    // n = 4 at trim 0.2 -> g = 0: loud (use welchT)
    val tiny = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    intercept[IllegalArgumentException] {
      Drift.yuenTrimmed(tiny, b, "v", trim = 0.2).collect()
    }
  }

  test("yuenTrimmed: matches a brute sorted-trim reference on seeded " +
      "random data, ignores a planted outlier, partitioning-invariant") {
    val rnd = new scala.util.Random(3117)
    // 6dp-snappable values (the operator's fixed-point convention)
    def snap(x: Double) = math.round(x * 1048576d) / 1048576d
    val va = (1 to 300).map(_ => snap(20.0 + 2.0 * rnd.nextGaussian()))
    val vb = (1 to 280).map(_ => snap(21.0 + 2.0 * rnd.nextGaussian()))
    val a = va.toDF("v"); val b = vb.toDF("v")
    val r = Drift.yuenTrimmed(a, b, "v", trim = 0.2).collect().head
    // brute: sort, drop g each tail, textbook Yuen arithmetic
    def brute(xs: Seq[Double]): (Long, Long, Double, Double) = {
      val s = xs.sorted
      val n = s.length
      val g = math.floor(n * 0.2).toInt
      val h = n - 2 * g
      val mid = s.slice(g, n - g)
      val tmean = mid.sum / h
      val wins = s.take(g).map(_ => s(g)) ++ mid ++
        s.takeRight(g).map(_ => s(n - g - 1))
      val wm = wins.sum / n
      val sw2 = wins.map(x => (x - wm) * (x - wm)).sum / (n - 1)
      val d = sw2 * (n - 1) / (h.toDouble * (h - 1))
      (g.toLong, h.toLong, tmean, d)
    }
    val (ga, ha, tma, da) = brute(va)
    val (gb, hb, tmb, db) = brute(vb)
    assert(r.getAs[Long]("g_a") == ga && r.getAs[Long]("h_a") == ha)
    assert(r.getAs[Long]("g_b") == gb && r.getAs[Long]("h_b") == hb)
    assert(math.abs(r.getAs[Double]("tmean_a") - tma) < 1e-5)
    assert(math.abs(r.getAs[Double]("tmean_b") - tmb) < 1e-5)
    val tRef = (tma - tmb) / math.sqrt(da + db)
    assert(math.abs(r.getAs[Double]("t") - tRef) < 1e-4)
    // a planted enormous outlier leaves every trimmed quantity intact
    // as long as it stays inside the same trim budget
    val ro = Drift.yuenTrimmed((va :+ 1e6).toDF("v"), b, "v", 0.2)
      .collect().head
    // n 300 -> 301: g stays 60, one more kept row; tmean moves by at
    // most the one swapped boundary row
    assert(math.abs(ro.getAs[Double]("tmean_a") - tma) < 0.1)
    assert(ro.getAs[Double]("p_t") <= r.getAs[Double]("p_t") + 0.05)
    // exact fixed-point pipeline: layout cannot change a bit
    val rp = Drift.yuenTrimmed(a.repartition(13), b.repartition(5),
      "v", 0.2).collect().head
    assert(r == rp)
  }

  test("cmh: hand-computed two-strata example, single-arm stratum " +
      "contributes nothing, Simpson direction, layout-invariant") {
    // stratum s1: A 8/10 vs B 4/10; stratum s2: A 3/10 vs B 1/10 —
    // a consistent A-advantage within strata
    def rows(seg: String, arm: String, k: Int, n: Int) =
      (1 to n).map(i => (seg, arm, i <= k))
    val df = (rows("s1", "g0", 8, 10) ++ rows("s1", "g1", 4, 10) ++
      rows("s2", "g0", 3, 10) ++ rows("s2", "g1", 1, 10))
      .toDF("seg", "arm", "success")
    val r = Drift.cmh(df, "seg", "arm", "success", "g0", "g1")
      .collect().head
    assert(r.getAs[Long]("n_strata") == 2 && r.getAs[Long]("n") == 40)
    // hand: s1 E=6, diff=2, var=10·10·12·8/(400·19)=1.26315789...;
    //       s2 E=2, diff=1, var=10·10·4·16/(400·19)=0.84210526...
    // (terms snap to 2^-20 before summing — within 1e-5 of exact)
    val sv = 10.0 * 10 * 12 * 8 / (400.0 * 19) + 10.0 * 10 * 4 * 16 /
      (400.0 * 19)
    assert(math.abs(r.getAs[Double]("chi2") - 9.0 / sv) < 1e-4,
      s"${r.getAs[Double]("chi2")} vs ${9.0 / sv}")
    // OR_MH = (8·6/20 + 3·9/20) / (2·4/20 + 7·1/20) = 3.75/0.75 = 5.0
    assert(math.abs(r.getAs[Double]("or_mh") - 5.0) < 1e-4)
    assert(r.getAs[Double]("p_value") > 0.0 &&
      r.getAs[Double]("p_value") < 0.05)
    // a stratum with only one arm adds 0 to every sum
    val extra = df.unionByName(rows("s3", "g0", 5, 10)
      .toDF("seg", "arm", "success"))
    val re = Drift.cmh(extra, "seg", "arm", "success", "g0", "g1")
      .collect().head
    assert(re.getAs[Long]("n_strata") == 3)
    assert(re.getAs[Double]("chi2") == r.getAs[Double]("chi2"))
    assert(re.getAs[Double]("or_mh") == r.getAs[Double]("or_mh"))
    // layout invariance (snapped per-stratum terms, long sums)
    val rp = Drift.cmh(df.repartition(7), "seg", "arm", "success",
      "g0", "g1").collect().head
    assert(r == rp)
  }

  test("did: hand-computed 2x2 effect, immune to a common time trend " +
      "and to pre-existing group differences; loud on thin cells") {
    val rnd = new scala.util.Random(6021)
    def cell(arm: String, per: String, base: Double, n: Int) =
      (1 to n).map(_ => (arm, per,
        math.round((base + rnd.nextGaussian()) * 64d) / 64d))
    // T: 10 -> 13 (+3); C: 20 -> 21 (+1) -> did ≈ 2
    val df = (cell("t", "pre", 10, 200) ++ cell("t", "post", 13, 220) ++
      cell("c", "pre", 20, 210) ++ cell("c", "post", 21, 190))
      .toDF("arm", "period", "v")
    val r = Drift.did(df, "arm", "period", "v", "t", "c", "pre", "post")
      .collect().head
    assert(math.abs(r.getAs[Double]("did") - 2.0) < 0.5)
    assert(r.getAs[Double]("p_value") < 0.01)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("did") &&
      r.getAs[Double]("did") < r.getAs[Double]("ci_hi"))
    // recompute did from the reported (6dp) cell means
    assert(math.abs(r.getAs[Double]("did") -
      ((r.getAs[Double]("mean_t_post") - r.getAs[Double]("mean_t_pre"))
       - (r.getAs[Double]("mean_c_post")
          - r.getAs[Double]("mean_c_pre")))) < 1e-5)
    // a COMMON additive post-period shock cancels exactly: shift every
    // post row (both arms) by +7 -> identical did/se/z
    val shocked = df.select(col("arm"), col("period"),
      when(col("period") === "post", col("v") + 7.0).otherwise(col("v"))
        .as("v"))
    val rs = Drift.did(shocked, "arm", "period", "v", "t", "c",
      "pre", "post").collect().head
    assert(rs.getAs[Double]("did") == r.getAs[Double]("did"))
    assert(rs.getAs[Double]("se") == r.getAs[Double]("se"))
    // a missing or thin cell is loud
    intercept[IllegalArgumentException] {
      Drift.did(df.where(!(col("arm") === "c" && col("period") === "pre")),
        "arm", "period", "v", "t", "c", "pre", "post")
    }
    // layout invariance
    val rp = Drift.did(df.repartition(9), "arm", "period", "v",
      "t", "c", "pre", "post").collect().head
    assert(r == rp)
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized (seeded) property pins for the round-16 statistics: the
  * grouped operators must agree EXACTLY with their single-group
  * machinery on every slice (different plans, same pinned arithmetic),
  * and Fisher's exact p must track the exact BigInt-rational
  * hypergeometric reference.
  */
class Round16PropertySpec extends graft.SparkSpec {
  import spark.implicits._

  test("ksByGroup == ksTest per slice, wassersteinByGroup == " +
      "wasserstein1 per slice, on random grouped data (bit-exact)") {
    val rnd = new Random(1016)
    val groups = Seq("ga", "gb", "gc", "gd")
    def sample() = (0 until 400).map { _ =>
      (groups(rnd.nextInt(groups.size)),
        math.round(rnd.nextGaussian() * 8 + rnd.nextInt(3) * 5) / 2.0)
    }
    val a = sample().toDF("g", "v")
    val b = sample().map { case (g, v) => (g, v + rnd.nextInt(3)) }
      .toDF("g", "v")
    val ks = Drift.ksByGroup(a, b, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val w1 = Drift.wassersteinByGroup(a, b, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    groups.foreach { g =>
      val sa = a.where(col("g") === g).select("v")
      val sb = b.where(col("g") === g).select("v")
      val kRef = Drift.ksTest(sa, sb, "v").collect().head
      val kGot = ks(g)
      assert(kGot.getAs[Double]("d") == kRef.getAs[Double]("d"), s"d $g")
      assert(kGot.getAs[Double]("d_num") == kRef.getAs[Double]("d_num"))
      assert(kGot.getAs[Double]("split_value")
        == kRef.getAs[Double]("split_value"), s"split $g")
      assert(kGot.getAs[Double]("lambda") == kRef.getAs[Double]("lambda"))
      assert(kGot.getAs[Double]("p_value")
        == kRef.getAs[Double]("p_value"), s"p $g")
      val wRef = Drift.wasserstein1(sa, sb, "v").collect().head
      val wGot = w1(g)
      assert(wGot.getAs[Double]("w1") == wRef.getAs[Double]("w1"),
        s"w1 $g: ${wGot.getAs[Double]("w1")} vs ${wRef.getAs[Double]("w1")}")
      assert(wGot.getAs[Long]("n_values") == wRef.getAs[Long]("n_values"))
    }
    graft.util.Caches.unpersistAll()
  }

  test("proportionsBySegment == proportionsZ per slice on random " +
      "segmented arms (bit-exact z and p)") {
    val rnd = new Random(2016)
    val segs = Seq("s1", "s2", "s3", "s4", "s5")
    val rows = (0 until 3000).map { _ =>
      val s = segs(rnd.nextInt(segs.size))
      val arm = if (rnd.nextBoolean()) "a" else "b"
      // per-(segment, arm) success rates vary so z's differ per segment
      val rate = 0.2 + 0.1 * (s.hashCode % 3).abs +
        (if (arm == "a") 0.05 * (s.hashCode % 2).abs else 0.0)
      (s, arm, rnd.nextDouble() < rate)
    }
    val df = rows.toDF("seg", "arm", "ok")
    val got = Drift.proportionsBySegment(df, "seg", "arm", "ok", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    segs.foreach { s =>
      val slice = df.where(col("seg") === s)
      val ref = Drift.proportionsZ(slice, "arm", "ok", "a", "b")
        .collect().head
      val g = got(s)
      assert(g.getAs[Long]("n_a") == ref.getAs[Long]("n_a"))
      assert(g.getAs[Long]("k_b") == ref.getAs[Long]("k_b"))
      assert(g.getAs[Double]("rate_a") == ref.getAs[Double]("rate_a"))
      assert(g.getAs[Double]("z") == ref.getAs[Double]("z"),
        s"z $s: ${g.getAs[Double]("z")} vs ${ref.getAs[Double]("z")}")
      assert(g.getAs[Double]("p_value") == ref.getAs[Double]("p_value"),
        s"p $s")
    }
  }

  test("fisherExact tracks the exact BigInt hypergeometric two-sided p " +
      "across random small tables") {
    val rnd = new Random(3016)
    def binom(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    var checked = 0
    (0 until 40).foreach { _ =>
      val (aa, bb, cc, dd) = (rnd.nextInt(12), rnd.nextInt(12),
        rnd.nextInt(12), rnd.nextInt(12))
      val n = aa + bb + cc + dd
      if (n > 0) {
        val df = (Seq.fill(aa)((true, true)) ++
          Seq.fill(bb)((true, false)) ++ Seq.fill(cc)((false, true)) ++
          Seq.fill(dd)((false, false))).toDF("x", "y")
        val got = Drift.fisherExact(df, "x", "y").collect().head
          .getAs[Double]("p_value")
        // exact rational reference: pmf(k) = C(r1,k)C(r2,c1-k)/C(n,c1),
        // two-sided = sum of pmf at most the observed pmf (exact
        // comparison on rationals — no epsilon)
        val (r1, r2, c1) = (aa + bb.toLong, cc + dd.toLong, aa + cc.toLong)
        val den = binom(n, c1)
        def num(k: Long) = binom(r1, k) * binom(r2, c1 - k)
        val kLo = math.max(0L, c1 - r2)
        val kHi = math.min(r1, c1)
        val obs = num(aa)
        val pExact = (kLo to kHi).filter(k => num(k) <= obs)
          .map(k => BigDecimal(num(k)) / BigDecimal(den)).sum.toDouble
        // the operator quantizes log-pmfs to the x2^20 grid: inclusion
        // can flip only at near-ties, so compare with a slack that
        // covers one boundary pmf term for these table sizes
        assert(math.abs(got - math.min(1.0, pExact)) < 5e-4,
          s"($aa,$bb,$cc,$dd): op $got vs exact $pExact")
        checked += 1
      }
    }
    assert(checked >= 35)
  }

  test("bootstrapLiftCI equals bootstrapMeanCI's machinery when one " +
      "side is a constant-zero arm (the lift IS the mean)") {
    val a = (1 to 150).map(i => (s"a$i", 3.0 + (i % 7))).toDF("id", "v")
    val z = (1 to 150).map(i => (s"z$i", 0.0)).toDF("id", "v")
    val lift = Drift.bootstrapLiftCI(a, z, "id", "v", nBoot = 80,
      salt = "pp").collect().head
    // against a constant-zero arm the lift equals the a-side mean, and
    // the interval must bracket it tightly (sd ~2 over 150 rows)
    val meanA = (1 to 150).map(i => 3.0 + (i % 7)).sum / 150.0
    assert(math.abs(lift.getAs[Double]("lift") - meanA) < 1e-6)
    assert(lift.getAs[Double]("ci_lo") < meanA
      && meanA < lift.getAs[Double]("ci_hi"))
    assert(lift.getAs[Double]("ci_hi") - lift.getAs[Double]("ci_lo") < 2.0)
  }
}

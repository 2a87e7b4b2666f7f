package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the significance kernel: the A&S 7.1.26 erfc and the
  * closed-form χ² survival — accuracy against exact references
  * (java.lang.Math has no erfc; the constants below are
  * independently-computed textbook values), and BIT-equality between
  * the driver form and the Column form (the plan and the driver must
  * be the same function, not two approximations of one).
  */
class PValuesSpec extends AnyFunSuite with graft.SparkSpec {

  test("erfc matches exact textbook values within the A&S 1.5e-7 bound") {
    // exact erfc values (Abramowitz & Stegun tables / mpmath)
    val exact = Seq(
      0.0 -> 1.0,
      0.5 -> 0.4795001221869535,
      1.0 -> 0.15729920705028513,
      1.3859038243496777 -> 0.05, // erfc^{-1}(0.05)·≈ z=1.96/√2
      2.0 -> 0.004677734981063127,
      3.0 -> 2.209049699858544e-5)
    exact.foreach { case (x, e) =>
      assert(math.abs(PValues.erfc(x) - e) < 1.5e-7,
        s"erfc($x) = ${PValues.erfc(x)} vs exact $e")
    }
  }

  test("two-sided z p-values hit the classic critical points at 6dp") {
    // z = 1.959964 is the exact 5% two-sided point; 2.575829 the 1%
    assert(math.abs(PValues.pTwoSidedZ(1.959964) - 0.05) < 1e-6)
    assert(math.abs(PValues.pTwoSidedZ(-1.959964) - 0.05) < 1e-6)
    assert(math.abs(PValues.pTwoSidedZ(2.575829) - 0.01) < 1e-6)
    assert(PValues.round6(PValues.pTwoSidedZ(0.0)) == 1.0)
    assert(PValues.pTwoSidedZ(10.0) < 1e-15)
  }

  test("chiSqSurvival hits the classic critical values, even and odd dof") {
    // χ² upper-5% critical values: dof 1 → 3.841459, 2 → 5.991465,
    // 3 → 7.814728, 4 → 9.487729, 5 → 11.070498
    val crit = Seq(1 -> 3.841459, 2 -> 5.991465, 3 -> 7.814728,
      4 -> 9.487729, 5 -> 11.070498)
    crit.foreach { case (k, x) =>
      val p = PValues.chiSqSurvival(x, k)
      assert(math.abs(p - 0.05) < 1e-6, s"Q($x; $k) = $p, want 0.05")
    }
    // even dof closed checks: Q(x;2) = e^(−x/2)
    assert(PValues.chiSqSurvival(2.0, 2) == math.exp(-1.0))
    // dof 1 is exactly erfc(√(x/2))
    assert(PValues.chiSqSurvival(3.0, 1) == PValues.erfc(math.sqrt(1.5)))
    // boundaries: Q(0) = 1 exactly; huge x underflows toward 0
    assert(PValues.chiSqSurvival(0.0, 4) == 1.0)
    assert(PValues.chiSqSurvival(1000.0, 3) < 1e-200)
  }

  test("chiSqSurvival at a large odd dof matches the even-dof bracket") {
    // Q is monotone in dof: Q(x; 91) < Q(x; 92)... wait, Q INCREASES
    // with dof at fixed x — the odd-dof series must land strictly
    // between its even neighbours (a wrong gamma seed or power chain
    // would throw it far outside)
    val x = 100.0
    val q91 = PValues.chiSqSurvival(x, 91)
    val q92 = PValues.chiSqSurvival(x, 92)
    val q93 = PValues.chiSqSurvival(x, 93)
    assert(q91 < q92 && q92 < q93, s"$q91 / $q92 / $q93")
    assert(q92 > 0.2 && q92 < 0.3) // sanity band (exact ≈ 0.26358)
  }

  test("Column forms are BIT-identical to the driver forms") {
    val xs = Seq(0.0, 0.1, 0.7, 1.3, 2.9, 5.5, 17.25, 100.0)
    import spark.implicits._
    val df = xs.toDF("x")
    val got = df.select(
      PValues.erfcCol(col("x")).as("e"),
      PValues.pTwoSidedZCol(col("x")).as("p"),
      PValues.chiSqSurvivalCol(col("x"), 1).as("q1"),
      PValues.chiSqSurvivalCol(col("x"), 4).as("q4"),
      PValues.chiSqSurvivalCol(col("x"), 7).as("q7"),
      col("x")).collect()
    got.foreach { r =>
      val x = r.getDouble(5)
      assert(r.getDouble(0) == PValues.erfc(x), s"erfc($x)")
      assert(r.getDouble(1) == PValues.pTwoSidedZ(x), s"p($x)")
      assert(r.getDouble(2) == PValues.chiSqSurvival(x, 1), s"q1($x)")
      assert(r.getDouble(3) == PValues.chiSqSurvival(x, 4), s"q4($x)")
      assert(r.getDouble(4) == PValues.chiSqSurvival(x, 7), s"q7($x)")
    }
  }

  test("SQL forms carry the pinned literals and the DOUBLE casts") {
    val e = PValues.erfcSql("zz")
    assert(e.contains("0.3275911::DOUBLE"))
    assert(e.contains("1.061405429::DOUBLE"))
    assert(e.contains("exp(-((zz) * (zz)))"))
    val even = PValues.chiSqSurvivalSql("hh", 6)
    assert(even.contains("exp(-((hh) / 2.0::DOUBLE))"))
    assert(even.contains("least(1.0::DOUBLE"))
    val odd = PValues.chiSqSurvivalSql("hh", 5)
    // gamma constants ride as Double.toString literals from the SAME
    // driver recurrence — bit-identical by construction
    val g1 = math.sqrt(math.Pi) / 2.0
    assert(odd.contains(s"CAST('${g1.toString}' AS DOUBLE)"))
    assert(odd.contains(s"CAST('${(g1 * 1.5).toString}' AS DOUBLE)"))
    intercept[IllegalArgumentException](PValues.chiSqSurvivalSql("x", 0))
    intercept[IllegalArgumentException](PValues.chiSqSurvivalSql("x", 500))
  }

  test("ibetaReg matches 50-digit mpmath references to < 1e-9") {
    // expected values generated once with mpmath.betainc(regularized)
    // at dps=50 over the t/F regimes the engine produces
    val pins = Seq(
      (0.3, 2.5, 0.5, 0.01892712407194565),
      (0.2, 0.5, 1.0, 0.4472135954999579),
      (0.8333333333333334, 2.5, 0.5, 0.36321746764912266),
      (0.5, 0.5, 0.5, 0.5),
      (0.65, 10.0, 2.0, 0.06058234505083009))
    pins.foreach { case (x, a, b, want) =>
      val got = PValues.ibetaReg(x, a, b)
      assert(math.abs(got - want) < 1e-9, s"I_$x($a,$b): $got vs $want")
    }
    // edges
    assert(PValues.ibetaReg(0.0, 5.0, 0.5) == 0.0)
    assert(PValues.ibetaReg(1.0, 5.0, 0.5) == 1.0)
    assert(PValues.ibetaReg(-0.1, 5.0, 0.5) == 0.0)
    assert(PValues.ibetaReg(1.1, 5.0, 0.5) == 1.0)
    // out of the validated regime (min(a,b) > IbetaMinShapeMax): loud,
    // never a silently-unconverged value (measured ~4e-7 error by
    // min(a,b)=5000) — one large shape with the other small is fine
    assert(PValues.ibetaReg(0.5, 60000.0, 500.0) >= 0.0)
    val big = intercept[IllegalArgumentException](
      PValues.ibetaReg(0.5, 60000.0, 1200.0))
    assert(big.getMessage.contains("not converged"))
  }

  test("pStudentT2 matches the dof=1/dof=2 closed forms and the " +
      "normal limit; fSurvival matches its chi-square and t relatives") {
    // dof=1 (Cauchy): p = 1 − (2/π)·atan(|t|)
    Seq(0.5, 1.0, 2.0, 5.0).foreach { t =>
      val want = 1.0 - (2.0 / math.Pi) * math.atan(t)
      assert(math.abs(PValues.pStudentT2(t, 1.0) - want) < 1e-9, s"t1 $t")
    }
    // dof=2: p = 1 − t/√(t²+2)
    Seq(0.5, 1.0, 2.0, 5.0).foreach { t =>
      val want = 1.0 - t / math.sqrt(t * t + 2.0)
      assert(math.abs(PValues.pStudentT2(t, 2.0) - want) < 1e-9, s"t2 $t")
    }
    // large dof → two-sided normal (erfc form) to ~1e-5 at dof 1e5
    Seq(0.5, 1.96, 3.0).foreach { t =>
      assert(math.abs(PValues.pStudentT2(t, 100000.0)
        - PValues.pTwoSidedZ(t)) < 1e-5, s"normal limit $t")
    }
    // t symmetry + degenerate dof
    assert(PValues.pStudentT2(2.0, 7.0) == PValues.pStudentT2(-2.0, 7.0))
    assert(PValues.pStudentT2(0.0, 7.0) == 1.0)
    assert(PValues.pStudentT2(1.0, 0.0) == 1.0)
    // F(1, d) survival at f = t² == two-sided t_d p at t
    Seq((1.5, 10.0), (2.5, 4.0), (0.7, 30.0)).foreach { case (t, d) =>
      assert(math.abs(PValues.fSurvival(t * t, 1.0, d)
        - PValues.pStudentT2(t, d)) < 1e-9, s"F(1,$d) vs t")
    }
    // F(d1, ∞−ish) survival → χ²_{d1} survival at d1·f
    Seq((1.3, 4.0), (2.2, 2.0)).foreach { case (f, d1) =>
      assert(math.abs(PValues.fSurvival(f, d1, 1e7)
        - PValues.chiSqSurvival(d1 * f, d1.toInt)) < 1e-4,
        s"F($d1,inf) vs chi2")
    }
    // monotone decreasing in f
    val ps = Seq(0.0, 0.5, 1.0, 2.0, 4.0, 8.0)
      .map(f => PValues.fSurvival(f, 4.0, 100.0))
    assert(ps == ps.sorted.reverse && ps.head == 1.0)
  }

  test("ibetaRegCol is BIT-identical to the driver form") {
    import spark.implicits._
    val cases = Seq(
      (0.3, 2.5, 0.5), (0.9997, 29995.0, 0.5), (0.2, 0.5, 1.0),
      (0.8333333333333334, 2.5, 0.5), (0.5, 0.5, 0.5), (0.65, 10.0, 2.0),
      (0.999983, 29995.0, 2.0), (1.0, 5.0, 0.5), (0.0, 5.0, 0.5))
    val got = cases.toDF("x", "a", "b")
      .select(col("x"), col("a"), col("b"),
        PValues.ibetaRegCol(col("x"), col("a"), col("b")).as("p"))
      .collect()
    got.foreach { r =>
      val want = PValues.ibetaReg(r.getDouble(0), r.getDouble(1),
        r.getDouble(2))
      assert(r.getDouble(3) == want,
        s"ibeta(${r.getDouble(0)}, ${r.getDouble(1)}, ${r.getDouble(2)})")
    }
  }

  test("ibetaRegSqlCtes emits the pinned chain: fixed iteration count, " +
      "Lanczos literals, guard epsilon, intermediate-free projections") {
    val (ctes, fin) = PValues.ibetaRegSqlCtes("tb", "src")
    assert(fin == "tb_f")
    // one CTE per iteration, all present
    (0 to PValues.IbetaIters).foreach(i => assert(ctes.contains(s"tb_i$i ")))
    assert(!ctes.contains(s"tb_i${PValues.IbetaIters + 1} "))
    // pinned literals: Lanczos c1 and the 0.5·ln(2π) front constant
    assert(ctes.contains("CAST('676.5203681218851' AS DOUBLE)"))
    assert(ctes.contains("CAST('0.9189385332046727' AS DOUBLE)"))
    assert(ctes.contains("1e-30::DOUBLE"))
    // every iteration projects ONLY carried state back out (the lateral
    // alias capture bug: a leaked `zd` in CTE N binds CTE N+1's refs)
    assert(ctes.contains("SELECT x0, a0, b0, dir, bt, x, a, b, zc2 AS c"))
  }
}

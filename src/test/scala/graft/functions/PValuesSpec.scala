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
}

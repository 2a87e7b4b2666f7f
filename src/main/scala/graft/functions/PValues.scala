package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, exp, lit, sqrt => csqrt}

/** Significance-readout kernels shared by the [[graft.ops.Drift]] /
  * [[graft.ops.TimeSeries]] statistics: the complementary error function
  * and the χ² survival function, each in THREE bit-aligned forms —
  * driver-side `Double`, Spark `Column`, and DuckDB SQL text — so a
  * p-value computed by any of them replays hash-identically on the
  * other engine.
  *
  * erfc uses Abramowitz & Stegun 7.1.26 (the classic 5-term rational
  * polynomial, max abs error 1.5e-7 — far inside the 6dp reporting
  * grid): erfc(x) = (a₁t + a₂t² + a₃t³ + a₄t⁴ + a₅t⁵)·e^(−x²) with
  * t = 1/(1 + px), x ≥ 0. The polynomial is evaluated in ONE pinned
  * Horner order and every literal is written identically in all three
  * forms, so the only cross-engine risk is `exp` itself — the same
  * dependence [[graft.ops.Drift.ksTest]]'s Kolmogorov series has carried
  * green for six rounds (ULP differences are invisible under the
  * engine-wide round-6 convention). The DRIVER forms call
  * `StrictMath.exp`, not `Math.exp`: Spark's `Exp` expression evaluates
  * via StrictMath, and the two can differ by one ULP (Math.exp is an
  * intrinsic allowed 1-ULP error) — with StrictMath the driver and
  * Column forms are BIT-identical, not merely round-6-identical
  * (PValuesSpec pins this).
  *
  * The χ² survival function Q(x; k) = P(χ²_k > x) comes in closed form
  * for INTEGER dof — no incomplete-gamma library needed on either
  * engine:
  *   - even k = 2m:  Q = e^(−x/2) · Σ_{j=0}^{m−1} (x/2)^j / j!
  *     (the Erlang form [[graft.ops.Drift.kruskalWallis]] shipped for
  *     even dof since round 13), terms by the pinned recurrence
  *     term_j = term_{j−1}·(x/2)/j accumulated first-to-last;
  *   - odd k = 2m+1: Q = erfc(√(x/2)) + Σ_{j=1}^{m} (x/2)^{j−1/2}
  *     · e^(−x/2) / Γ(j+1/2), the half-integer gamma recurrence
  *     Γ(j+1/2) = Γ(j−1/2)·(j−1/2) seeded at Γ(3/2) = √π/2.
  * The SQL form UNROLLS the series for a dof fixed at generation time
  * (powers as left-associated repeated products — the exact double
  * sequence the driver's `pw = pw * x2` loop produces — and the gamma
  * constants emitted as `CAST('<Double.toString>' AS DOUBLE)` literals
  * from the SAME Scala recurrence, so they are bit-identical by
  * construction, not by libm luck).
  *
  * Two-sided normal p for a z statistic is erfc(|z|/√2) — the readout
  * the rank/trend family (mannWhitney, wilcoxonSignedRank, mannKendall)
  * and, as a large-sample approximation, welchT ship.
  */
object PValues {

  /** A&S 7.1.26 constants — written once; the Column and SQL forms
    * must spell these digit-for-digit.
    */
  private val P  = "0.3275911"
  private val A1 = "0.254829592"
  private val A2 = "0.284496736" // subtracted
  private val A3 = "1.421413741"
  private val A4 = "1.453152027" // subtracted
  private val A5 = "1.061405429"

  /** erfc(x) for x ≥ 0 — A&S 7.1.26, pinned Horner order. */
  def erfc(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    poly * java.lang.StrictMath.exp(-(x * x))
  }

  /** [[erfc]] as a Spark Column — the identical arithmetic tree (the
    * staged `t` is duplicated per use; deterministic, just recomputed).
    * Caller guarantees x ≥ 0 (wrap in `abs`).
    */
  def erfcCol(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t
      + lit(1.421413741)) * t - lit(0.284496736)) * t
      + lit(0.254829592)) * t
    poly * exp(-(x * x))
  }

  /** [[erfc]] as DuckDB SQL text over scalar expression `x` (x ≥ 0).
    * Every literal carries `::DOUBLE` — DuckDB parses bare decimal
    * literals as DECIMAL, which would change the arithmetic.
    */
  def erfcSql(x: String): String = {
    val t = s"(1.0::DOUBLE / (1.0::DOUBLE + $P::DOUBLE * ($x)))"
    s"((((($A5::DOUBLE * $t - $A4::DOUBLE) * $t + $A3::DOUBLE) * $t" +
      s" - $A2::DOUBLE) * $t + $A1::DOUBLE) * $t" +
      s" * exp(-(($x) * ($x))))"
  }

  /** Two-sided normal p from a z statistic: erfc(|z|/√2), pinned. */
  def pTwoSidedZ(z: Double): Double =
    math.min(1.0, math.max(0.0, erfc(math.abs(z) / math.sqrt(2.0))))

  /** [[pTwoSidedZ]] as a Column. */
  def pTwoSidedZCol(z: Column): Column = {
    val p = erfcCol(abs(z) / lit(math.sqrt(2.0)))
    org.apache.spark.sql.functions.least(lit(1.0),
      org.apache.spark.sql.functions.greatest(lit(0.0), p))
  }

  /** [[pTwoSidedZ]] as DuckDB SQL text over scalar expression `z`. */
  def pTwoSidedZSql(z: String): String = {
    val inner = erfcSql(s"abs($z) / sqrt(2.0::DOUBLE)")
    s"least(1.0::DOUBLE, greatest(0.0::DOUBLE, $inner))"
  }

  /** Γ(j+1/2) for j = 1..m by the half-integer recurrence, in the
    * driver's double order — the shared constant table the odd-dof SQL
    * form emits as string literals.
    */
  private def halfGammas(m: Int): Array[Double] = {
    val g = new Array[Double](m + 1)
    g(1) = math.sqrt(math.Pi) / 2.0 // Γ(3/2)
    var j = 2
    while (j <= m) { g(j) = g(j - 1) * (j - 1 + 0.5); j += 1 }
    g
  }

  /** χ² survival Q(x; dof) = P(χ²_dof > x), integer dof ≥ 1, closed
    * form (even: Erlang sum; odd: erfc + half-gamma series), clamped
    * to [0, 1].
    */
  def chiSqSurvival(x: Double, dof: Int): Double = {
    require(dof >= 1, s"dof must be >= 1, got $dof")
    val x2 = x / 2.0
    if (dof % 2 == 0) {
      var term = 1.0
      var acc = 1.0
      var j = 1
      while (j < dof / 2) { term = term * x2 / j; acc += term; j += 1 }
      math.min(1.0, math.max(0.0, java.lang.StrictMath.exp(-x2) * acc))
    } else {
      val s = math.sqrt(x2)
      var q = erfc(s)
      val m = (dof - 1) / 2
      val g = halfGammas(math.max(m, 1))
      var pw = s
      var j = 1
      while (j <= m) {
        q = q + pw * java.lang.StrictMath.exp(-x2) / g(j)
        pw = pw * x2
        j += 1
      }
      math.min(1.0, math.max(0.0, q))
    }
  }

  /** [[chiSqSurvival]] as a Column for a dof known at PLAN time —
    * the same unrolled arithmetic (powers as left-associated repeated
    * products, gammas as literals from the driver recurrence).
    */
  def chiSqSurvivalCol(x: Column, dof: Int): Column = {
    require(dof >= 1, s"dof must be >= 1, got $dof")
    val x2 = x / lit(2.0)
    if (dof % 2 == 0) {
      var acc = lit(1.0)
      var term = lit(1.0)
      var j = 1
      while (j < dof / 2) {
        term = term * x2 / lit(j.toDouble)
        acc = acc + term
        j += 1
      }
      org.apache.spark.sql.functions.least(lit(1.0),
        org.apache.spark.sql.functions.greatest(lit(0.0),
          exp(-x2) * acc))
    } else {
      val s = csqrt(x2)
      val m = (dof - 1) / 2
      val g = halfGammas(math.max(m, 1))
      var q = erfcCol(s)
      var pw = s
      var j = 1
      while (j <= m) {
        q = q + pw * exp(-x2) / lit(g(j))
        pw = pw * x2
        j += 1
      }
      org.apache.spark.sql.functions.least(lit(1.0),
        org.apache.spark.sql.functions.greatest(lit(0.0), q))
    }
  }

  /** [[chiSqSurvival]] as DuckDB SQL text for a dof known at
    * GENERATION time (the dump-time-trained-oracle pattern): `x` must
    * be a SIMPLE scalar reference (it is repeated per series term —
    * stage any computation in a CTE first). Text size is O(terms²)
    * from the inlined power products; bounded by the dof guard.
    */
  def chiSqSurvivalSql(x: String, dof: Int): String = {
    require(dof >= 1, s"dof must be >= 1, got $dof")
    require(dof <= 400, s"unrolled SQL series capped at dof 400, got $dof")
    val x2 = s"(($x) / 2.0::DOUBLE)"
    if (dof % 2 == 0) {
      // term_j inlined left-assoc: (…((x2 * x2) / 2.0) * x2 …) / j —
      // term_1 = (1.0·x2)/1.0 = x2 bit-exactly, so it starts the chain
      var acc = "1.0::DOUBLE"
      var term = ""
      var j = 1
      while (j < dof / 2) {
        term = if (j == 1) x2 else s"(($term * $x2) / $j.0::DOUBLE)"
        acc = s"($acc + $term)"
        j += 1
      }
      s"least(1.0::DOUBLE, greatest(0.0::DOUBLE, exp(-$x2) * $acc))"
    } else {
      val s0 = s"sqrt($x2)"
      val m = (dof - 1) / 2
      val g = halfGammas(math.max(m, 1))
      var q = erfcSql(s0)
      var pw = s0
      var j = 1
      while (j <= m) {
        q = s"($q + ($pw * exp(-$x2))" +
          s" / CAST('${g(j).toString}' AS DOUBLE))"
        pw = s"($pw * $x2)"
        j += 1
      }
      s"least(1.0::DOUBLE, greatest(0.0::DOUBLE, $q))"
    }
  }

  /** 6dp HALF_UP snap — the engine-wide reporting convention. */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0
}

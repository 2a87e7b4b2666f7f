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

  // ------------------------------------------------------------------
  // Regularized incomplete beta I_x(a, b) — the F / Student-t p kernel
  // (round 17). Same tri-form convention as erfc/χ²: driver Double,
  // Spark Column, DuckDB SQL, every literal and every association
  // written identically so the three replay bit-aligned (libm exp/ln
  // ULPs are the only residual, invisible under round-6).
  //
  // Algorithm: Lentz modified continued fraction (the Numerical
  // Recipes betacf shape) with the standard symmetry switch
  // x < (a+1)/(a+b+2) → direct, else I_x(a,b) = 1 − I_{1−x}(b,a) —
  // and a PINNED iteration count (no data-dependent early exit, which
  // would not replay as SQL text): [[IbetaIters]] = 50 double-steps.
  // Validated regime (round 18 re-measurement): the 50-step fraction
  // is converged when min(a, b) ≤ [[IbetaMinShapeMax]] = 1000 — worst
  // absolute error 3.4e-11 over a 448-point sweep (the other shape up
  // to 6e4, x across (0,1) including the mean) against 60-digit
  // mpmath quadrature. Convergence degrades when BOTH shape
  // parameters grow: self-convergence error reaches ~9e-11 at
  // min(a,b)=2000 and ~4e-7 at 5000, so [[ibetaReg]] REFUSES (loud
  // IllegalArgumentException, also thrown from the Catalyst
  // expression's eval/codegen which delegate here) rather than
  // silently returning an unconverged value. t p-values always pass
  // b = 1/2; F p-values pass dof/2, so the guard binds callers to
  // min(dof1, dof2) ≤ 2000 — an ANOVA over >2001 groups must bin
  // first. Front factor x^a(1−x)^b / B(a,b) via the pinned Lanczos
  // (g=7, n=9) log-gamma below.
  // ------------------------------------------------------------------

  /** Lanczos (g = 7, n = 9) coefficients — written once as strings;
    * the SQL form emits them verbatim as CAST('…' AS DOUBLE).
    */
  private val LanczosC: Array[String] = Array(
    "0.99999999999980993", "676.5203681218851", "-1259.1392167224028",
    "771.32342877765313", "-176.61502916214059", "12.507343278686905",
    "-0.13857109526572012", "9.9843695780195716E-6",
    "1.5056327351493116E-7")
  private val LanczosD: Array[Double] = LanczosC.map(_.toDouble)
  private val HalfLn2Pi = "0.9189385332046727" // 0.5·ln(2π), exact repr
  private val HalfLn2PiD = HalfLn2Pi.toDouble

  /** ln Γ(z) for z ≥ 0.5 (all shape parameters here are ≥ 1/2) —
    * Lanczos g=7, pinned fold order.
    */
  def lgammaP(z: Double): Double = {
    val zz = z - 1.0
    var x = LanczosD(0)
    var i = 1
    while (i <= 8) { x = x + LanczosD(i) / (zz + i); i += 1 }
    val t = zz + 7.5
    HalfLn2PiD + (zz + 0.5) * java.lang.StrictMath.log(t) - t +
      java.lang.StrictMath.log(x)
  }

  /** [[lgammaP]] as a Column — identical tree (`log` is Spark's `Log`,
    * which evaluates via StrictMath like the driver form).
    */
  def lgammaPCol(z: Column): Column = {
    import org.apache.spark.sql.functions.log
    val zz = z - lit(1.0)
    var x = lit(LanczosD(0))
    var i = 1
    while (i <= 8) { x = x + lit(LanczosD(i)) / (zz + lit(i.toDouble)); i += 1 }
    val t = zz + lit(7.5)
    lit(HalfLn2PiD) + (zz + lit(0.5)) * log(t) - t + log(x)
  }

  /** [[lgammaP]] as DuckDB SQL text; `z` must be a SIMPLE scalar
    * reference (repeated ~10×).
    */
  def lgammaPSql(z: String): String = {
    val zz = s"(($z) - 1.0::DOUBLE)"
    var x = s"CAST('${LanczosC(0)}' AS DOUBLE)"
    var i = 1
    while (i <= 8) {
      x = s"($x + CAST('${LanczosC(i)}' AS DOUBLE) / ($zz + $i.0::DOUBLE))"
      i += 1
    }
    val t = s"($zz + 7.5::DOUBLE)"
    s"(CAST('$HalfLn2Pi' AS DOUBLE) + ($zz + 0.5::DOUBLE) * ln($t)" +
      s" - $t + ln($x))"
  }

  /** Pinned Lentz iteration count — fixed, NEVER data-dependent. */
  val IbetaIters = 50

  /** Largest min(a, b) the pinned 50-step fraction is VALIDATED for
    * (worst abs error 3.4e-11 at the bound; see the block comment).
    * Beyond it the fraction has not converged — [[ibetaReg]] throws.
    */
  val IbetaMinShapeMax = 1000.0
  private val FpMin = 1e-30

  /** Regularized incomplete beta I_x(a, b), a,b ≥ 0.5, clamped [0,1].
    * Driver form; [[ibetaRegCol]] / [[ibetaRegSqlCtes]] replay it.
    * REFUSES min(a, b) > [[IbetaMinShapeMax]]: the pinned fraction is
    * unconverged there and a silently-wrong p is worse than a loud
    * stop (bin the groups, or use a normal approximation upstream).
    */
  def ibetaReg(x0: Double, a0: Double, b0: Double): Double = {
    require(math.min(a0, b0) <= IbetaMinShapeMax,
      s"ibetaReg: min(a=$a0, b=$b0) > $IbetaMinShapeMax — the pinned " +
        s"$IbetaIters-iteration fraction is not converged in this " +
        "regime; reduce the smaller dof (e.g. bin an ANOVA's groups)")
    if (x0 <= 0.0) 0.0
    else if (x0 >= 1.0) 1.0
    else {
      val lnx = java.lang.StrictMath.log(math.max(x0, 1e-300))
      val ln1x = java.lang.StrictMath.log(math.max(1.0 - x0, 1e-300))
      val bt = java.lang.StrictMath.exp(
        lgammaP(a0 + b0) - lgammaP(a0) - lgammaP(b0)
          + a0 * lnx + b0 * ln1x)
      val direct = x0 < (a0 + 1.0) / ((a0 + b0) + 2.0)
      val x = if (direct) x0 else 1.0 - x0
      val a = if (direct) a0 else b0
      val b = if (direct) b0 else a0
      var c = 1.0
      var d = 1.0 - ((a + b) * x) / (a + 1.0)
      if (math.abs(d) < FpMin) d = FpMin
      d = 1.0 / d
      var h = d
      var m = 1
      while (m <= IbetaIters) {
        val md = m.toDouble
        val m2 = 2.0 * m
        val aa = (md * (b - md) * x) / ((a + (m2 - 1.0)) * (a + m2))
        d = 1.0 + aa * d
        if (math.abs(d) < FpMin) d = FpMin
        d = 1.0 / d
        c = 1.0 + aa / c
        if (math.abs(c) < FpMin) c = FpMin
        h = h * (d * c)
        val bb = (-(a + md) * ((a + b) + md) * x) /
          ((a + m2) * (a + (m2 + 1.0)))
        d = 1.0 + bb * d
        if (math.abs(d) < FpMin) d = FpMin
        d = 1.0 / d
        c = 1.0 + bb / c
        if (math.abs(c) < FpMin) c = FpMin
        h = h * (d * c)
        m += 1
      }
      val p = if (direct) (bt * h) / a else 1.0 - (bt * h) / a
      math.min(1.0, math.max(0.0, p))
    }
  }

  /** [[ibetaReg]] as a Column — a NATIVE Catalyst expression
    * ([[Expressions.IbetaReg]]) whose eval and codegen both delegate to
    * the driver kernel above, so the two are bit-identical by
    * construction AND stay inside WholeStageCodegen. (The fraction is
    * sequential state — unrolling it as a Column tree duplicates the
    * state subtrees exponentially; a compact expression with a JVM loop
    * is the Spark-native form, the [[Expressions]] preference order.)
    */
  def ibetaRegCol(x0: Column, a0: Column, b0: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(Expressions.IbetaReg(
      expression(x0.cast("double")), expression(a0.cast("double")),
      expression(b0.cast("double"))))
  }

  /** [[ibetaReg]] as a DuckDB CTE chain: the caller supplies a CTE
    * named `fromCte` exposing DOUBLE columns `ib_x, ib_a, ib_b` (any
    * row count — the fraction is per-row), and splices the returned
    * `(cteText, finalCteName)` into its WITH list; the final CTE
    * exposes ONE column `ib_p` per input row (plus `x0,a0,b0` and any
    * `passCols` carried through verbatim for joining back — the
    * multi-row-caller hook). Iterations become chained CTEs with
    * lateral column aliases — the [[chiSqSurvivalSql]] unrolling
    * precedent, O(Iters) text. SQL text cannot throw, so this form
    * carries no [[IbetaMinShapeMax]] guard — but every oracle that
    * splices it mirrors a Spark plan whose [[ibetaRegCol]] DOES
    * throw, so an out-of-regime input fails loudly on the engine side
    * before the oracle's unconverged value could be compared.
    */
  def ibetaRegSqlCtes(tag: String, fromCte: String,
      passCols: Seq[String] = Nil): (String, String) = {
    require(passCols.forall(c => !Seq("x0", "a0", "b0", "dir", "bt",
      "x", "a", "b", "c", "d", "h").contains(c)),
      s"passCols collide with chain state names: $passCols")
    val pass = passCols.map(c => s"$c, ").mkString
    val sb = new StringBuilder
    sb ++= s"""${tag}_p0 AS (
      SELECT ${pass}ib_x AS x0, ib_a AS a0, ib_b AS b0 FROM $fromCte),
      ${tag}_p1 AS (SELECT *,
        ln(greatest(x0, 1e-300::DOUBLE)) AS lnx,
        ln(greatest(1.0::DOUBLE - x0, 1e-300::DOUBLE)) AS ln1x,
        (x0 < (a0 + 1.0::DOUBLE) / ((a0 + b0) + 2.0::DOUBLE)) AS dir,
        ${lgammaPSql("(a0 + b0)")} AS lgab,
        ${lgammaPSql("a0")} AS lga,
        ${lgammaPSql("b0")} AS lgb
        FROM ${tag}_p0),
      ${tag}_p2 AS (SELECT ${pass}x0, a0, b0, dir,
        CASE WHEN x0 > 0.0::DOUBLE AND x0 < 1.0::DOUBLE
          THEN exp(lgab - lga - lgb + a0 * lnx + b0 * ln1x)
          ELSE 0.0::DOUBLE END AS bt,
        CASE WHEN dir THEN x0 ELSE 1.0::DOUBLE - x0 END AS x,
        CASE WHEN dir THEN a0 ELSE b0 END AS a,
        CASE WHEN dir THEN b0 ELSE a0 END AS b
        FROM ${tag}_p1),
      ${tag}_i0 AS (
        SELECT ${pass}x0, a0, b0, dir, bt, x, a, b, c, 1.0::DOUBLE / zd AS d,
          1.0::DOUBLE / zd AS h
        FROM (SELECT *, 1.0::DOUBLE AS c,
          (CASE WHEN abs(1.0::DOUBLE - ((a + b) * x) / (a + 1.0::DOUBLE))
              < 1e-30::DOUBLE THEN 1e-30::DOUBLE
            ELSE 1.0::DOUBLE - ((a + b) * x) / (a + 1.0::DOUBLE) END)
            AS zd
          FROM ${tag}_p2))"""
    // each iteration projects ONLY the carried state (x0..h) back out:
    // a leaked intermediate (za, zd, …) in CTE N would capture CTE
    // N+1's same-named lateral alias references
    var m = 1
    while (m <= IbetaIters) {
      val md = s"$m.0::DOUBLE"
      val m2m1 = s"${2 * m - 1}.0::DOUBLE"
      val m2 = s"${2 * m}.0::DOUBLE"
      val m2p1 = s"${2 * m + 1}.0::DOUBLE"
      sb ++= s""",
      ${tag}_i$m AS (
        SELECT ${pass}x0, a0, b0, dir, bt, x, a, b, zc2 AS c, zd2 AS d,
          zh2 AS h
        FROM (SELECT ${pass}x0, a0, b0, dir, bt, x, a, b,
          (($md * (b - $md) * x) / ((a + $m2m1) * (a + $m2))) AS za,
          (CASE WHEN abs(1.0::DOUBLE + za * d) < 1e-30::DOUBLE
            THEN 1e-30::DOUBLE ELSE 1.0::DOUBLE + za * d END) AS zdg,
          1.0::DOUBLE / zdg AS zd,
          (CASE WHEN abs(1.0::DOUBLE + za / c) < 1e-30::DOUBLE
            THEN 1e-30::DOUBLE ELSE 1.0::DOUBLE + za / c END) AS zc,
          h * (zd * zc) AS zh,
          (((-(a + $md)) * ((a + b) + $md) * x)
            / ((a + $m2) * (a + $m2p1))) AS zb,
          (CASE WHEN abs(1.0::DOUBLE + zb * zd) < 1e-30::DOUBLE
            THEN 1e-30::DOUBLE ELSE 1.0::DOUBLE + zb * zd END) AS zdg2,
          1.0::DOUBLE / zdg2 AS zd2,
          (CASE WHEN abs(1.0::DOUBLE + zb / zc) < 1e-30::DOUBLE
            THEN 1e-30::DOUBLE ELSE 1.0::DOUBLE + zb / zc END) AS zc2,
          zh * (zd2 * zc2) AS zh2
          FROM ${tag}_i${m - 1}))"""
      m += 1
    }
    sb ++= s""",
      ${tag}_f AS (SELECT ${pass}x0, a0, b0,
        least(1.0::DOUBLE, greatest(0.0::DOUBLE,
          CASE WHEN x0 <= 0.0::DOUBLE THEN 0.0::DOUBLE
            WHEN x0 >= 1.0::DOUBLE THEN 1.0::DOUBLE
            WHEN dir THEN (bt * h) / a
            ELSE 1.0::DOUBLE - (bt * h) / a END)) AS ib_p
        FROM ${tag}_i$IbetaIters)"""
    (sb.toString, s"${tag}_f")
  }

  /** Two-sided Student-t p: I_{dof/(dof+t²)}(dof/2, 1/2), pinned
    * argument order `dof / (dof + t * t)`. dof ≤ 0 degenerates to 1.
    */
  def pStudentT2(t: Double, dof: Double): Double =
    if (dof <= 0.0) 1.0
    else ibetaReg(dof / (dof + t * t), dof / 2.0, 0.5)

  /** F survival P(F_{d1,d2} > f) = I_{d2/(d2+d1·f)}(d2/2, d1/2),
    * pinned argument order `d2 / (d2 + d1 * f)`.
    */
  def fSurvival(f: Double, d1: Double, d2: Double): Double =
    if (d1 <= 0.0 || d2 <= 0.0) 1.0
    else ibetaReg(d2 / (d2 + d1 * f), d2 / 2.0, d1 / 2.0)

  /** One-sided UPPER-tail Student-t p: P(T_dof > t). The symmetric
    * distribution makes both branches one read of the same pinned
    * [[pStudentT2]] evaluation — t ≥ 0 → half the two-sided p, t < 0 →
    * its complement at |t| — so an oracle replays each branch from ONE
    * ibeta CTE chain per statistic. dof ≤ 0 degenerates to 1 (no
    * evidence), the [[pStudentT2]] convention. The TOST equivalence
    * test ([[graft.ops.Drift.welchTost]]) is the first consumer.
    */
  def pStudentTUpper(t: Double, dof: Double): Double =
    if (dof <= 0.0) 1.0
    else if (t >= 0.0) pStudentT2(t, dof) / 2.0
    else 1.0 - pStudentT2(-t, dof) / 2.0
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation (SURVEY §2.3
  * north-star family): flag and scrub emails, IPv4 addresses, and
  * NANP-style phone numbers before a corpus ships to training.
  *
  * Pure narrow codegen'd column work — `regexp_count` / `regexp_replace`
  * over each row, no shuffle, no UDF — so the pass is scan-bound at any
  * corpus size and the predicates/projections push into the scan.
  *
  * The patterns deliberately use only syntax with identical semantics in
  * Java regex (Spark) and RE2 (DuckDB): character classes, bounded
  * repetition, word boundaries. No backrefs, no lookaround.
  */
object Pii {

  /** user@host.tld — conservative, no quoting/plus-routing edge cases. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — does not range-check octets). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style nnn-nnnn local phone token. */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Per-document PII counts over the raw text:
    * (doc_id, n_emails, n_ips, n_phones, has_pii).
    * Counts are non-overlapping match counts of each pattern against the
    * ORIGINAL text (no scrub interaction between categories).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ne = regexp_count(col(textCol), lit(EmailRe))
    val ni = regexp_count(col(textCol), lit(Ipv4Re))
    val np = regexp_count(col(textCol), lit(PhoneRe))
    df.select(col(idCol).as("doc_id"),
      ne.cast("long").as("n_emails"),
      ni.cast("long").as("n_ips"),
      np.cast("long").as("n_phones"),
      (ne + ni + np > 0).as("has_pii"))
  }

  /** Redaction expression: emails first (their local part may contain
    * dots and digits that the narrower patterns would then mangle), then
    * IPs, then phones.
    */
  def scrubbed(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Replace `textCol` in place with the scrubbed text, schema otherwise
    * unchanged, so the stage composes with every downstream text op.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, scrubbed(col(textCol)))

  /** k-anonymity profile over a quasi-identifier combination (Sweeney
    * 2002): one row per distinct quasi-id combo with its population and
    * an `at_risk` flag for combos smaller than `k` — the re-identification
    * audit a curated release runs before shipping ("is any (segment,
    * nation, ...) cell so small it singles people out?").
    *
    * Shape at scale: ONE map-side-combined aggregation; output is bounded
    * by the product of quasi-id cardinalities, never corpus size.
    */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity's
    * blind spot is a large group whose SENSITIVE attribute is uniform —
    * group size protects nothing when everyone in it shares the secret.
    * Per quasi-id combo: group size, the number of DISTINCT sensitive
    * values, and `at_risk` when that diversity is below `l`. Composes
    * with [[kAnonymityProfile]] (size) as the second audit axis.
    *
    * Shape at scale: one two-level aggregate — distinct (quasi, sensitive)
    * pairs first (map-side combined), then the per-combo count — output
    * bounded by combo cardinality, corpus shuffles once on the quasi key.
    */
  def lDiversityProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    val qs = quasiCols.map(col)
    df.groupBy(qs: _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("at_risk", col("distinct_sensitive") < l)
  }

  /** k-anonymity SUPPRESSION: rows whose quasi-id combo has fewer than
    * `k` members get every quasi-id value replaced by `"*"` (full-cell
    * suppression — the baseline generalization operator); rows in
    * compliant combos pass through. Quasi-id columns come back as
    * strings (the suppression sentinel must inhabit every column type).
    *
    * Shape at scale: the combo-size table from [[kAnonymityProfile]]
    * (bounded by combo cardinality) joins back onto the corpus on the
    * quasi-id columns — a broadcast join whenever the combo table is
    * small, which is the definition of a quasi-identifier. The corpus
    * shuffles zero times.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val sizes = kAnonymityProfile(df, quasiCols, k)
      .select(quasiCols.map(col) :+ col("at_risk"): _*)
    val joined = df.join(broadcast(sizes), quasiCols)
    quasiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col("at_risk"), lit("*")).otherwise(col(c).cast("string")))
    }.drop("at_risk")
  }

  /** Laplace-mechanism noisy counts over `dims` — the ε-DP release shape
    * for a histogram (Dwork et al. 2006): noisy_n = max(0,
    * round(n + Lap(scale))), scale = sensitivity/ε = 1/ε for a count.
    *
    * The Laplace draw here is DETERMINISTIC — inverse-CDF applied to the
    * uniform u = (h32(dims ++ salt) + 1) / (P + 2) ∈ (0, 1), i.e.
    * noise = -scale · sign(u - ½) · ln(1 - 2|u - ½|) — so the release is
    * reproducible across runs, engines and layouts, which is what the
    * engine's oracle-gate methodology needs and what a pipeline TEST
    * wants. A production ε-DP release must swap the seeded draw for a
    * cryptographic RNG (a hash of the released key is not secret); the
    * mechanism, clamping and post-processing are exactly as released.
    *
    * Shape at scale: one map-side-combined count plus narrow per-group
    * math — output bounded by dim cardinality.
    */
  def noisyCounts(df: DataFrame, dims: Seq[String], scale: Double,
      salt: String = ""): DataFrame = {
    require(dims.nonEmpty, "at least one dimension column")
    require(scale > 0, s"scale must be positive, got $scale")
    import graft.functions.{TextFunctions => T}
    val u = (T.h32(concat_ws("|", dims.map(col) :+ lit(salt): _*))
      .cast("double") + lit(1d)) / lit(T.P.toDouble + 2d)
    val c = u - lit(0.5d)
    val noise = lit(-scale) * signum(c) * log(lit(1d) - lit(2d) * abs(c))
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n",
        greatest(lit(0d), round(col("n") + noise, 0)).cast("long"))
  }

  /** Salted-hash pseudonymization: replace each identifier column with a
    * stable surrogate key `substr(sha256(salt || ':' || value), 1, 16)`
    * — the standard key-coding step before a corpus with user/account
    * identifiers leaves its trust boundary. Stable (the same input maps
    * to the same surrogate on every run and every engine, so joins and
    * per-user aggregates still work downstream) but not reversible
    * without the salt; rotate the salt per release to prevent
    * cross-release linkage. NULL stays NULL (absence is not an
    * identity). 64 surrogate bits ⇒ birthday-bound collision odds stay
    * below ~10⁻⁸ up to ~10⁵ distinct ids and ~10⁻³ at 10⁸ — run
    * [[pseudonymCollisions]] as the release audit.
    *
    * Narrow codegen'd column work (one hash projection per column, no
    * shuffle, no UDF) — scan-bound at any corpus size, like [[scrub]].
    */
  def pseudonymize(df: DataFrame, idCols: Seq[String],
      salt: String): DataFrame = {
    require(idCols.nonEmpty, "at least one identifier column")
    idCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull,
          substring(sha2(concat(lit(salt), lit(":"),
            col(c).cast("string")), 256), 1, 16)))
    }
  }

  /** Release audit for [[pseudonymize]]: one row per surrogate that maps
    * from MORE THAN ONE distinct original value — a collision would
    * silently merge two users' histories downstream, so a release gate
    * wants this empty. Output: (surrogate, n_values).
    *
    * Shape at scale: distinct (value) pairs first (map-side combined),
    * then one count per surrogate — both on the hash key; no joins.
    */
  def pseudonymCollisions(df: DataFrame, idCol: String,
      salt: String): DataFrame = {
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("string").as("__v"))
      .distinct()
      .groupBy(substring(sha2(concat(lit(salt), lit(":"), col("__v")),
        256), 1, 16).as("surrogate"))
      .agg(count(lit(1)).as("n_values"))
      .where(col("n_values") > 1L)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third axis of the release-audit family: [[kAnonymityProfile]]
    * flags SMALL groups, [[lDiversityProfile]] flags UNIFORM groups,
    * and this flags groups whose sensitive-attribute DISTRIBUTION sits
    * far from the corpus's — an attacker who knows the quasi-id combo
    * learns the group's skew even when the group is large and diverse.
    *
    * Distance = the paper's ordered-distance Earth Mover's Distance
    * over the corpus's sorted distinct sensitive values v_1..v_m with
    * adjacent-step cost 1/(m−1):
    *   EMD(P_g, P) = (1/(m−1)) · Σ_{i=1}^{m−1} |F_g(v_i) − F(v_i)|
    * — normalized to [0, 1], so `t` carries the paper's threshold
    * semantics. `at_risk` flags EMD > t.
    *
    * Determinism: exact long counts; the per-step numerator
    * |cum_g·n − cum·n_g| in DECIMAL(38,0); per-step contribution
    * snapped to ×2^20 fixed-point longs and summed (the
    * [[graft.ops.Drift.wassersteinByGroup]] conventions); final
    * emd = round(sum / 2^20 / (m−1), 6). A single-valued corpus
    * (m = 1) has zero distance everywhere by convention.
    *
    * Shape at scale: per-(combo, value) counts map-side combine the
    * corpus once; the audit grid is |combos| × m rows (both
    * quasi-identifier-bounded, never corpus-sized); the per-group
    * cumulative runs through [[Drift.cumulativeByGroup]], so a
    * pathologically wide sensitive domain routes through the
    * distributed range-partitioned form instead of one window
    * partition. Output per combo:
    * (quasiCols..., group_n, n_values, emd, at_risk).
    */
  def tClosenessProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double,
      maxGroupDistinct: Long = 4000000L): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0, 1), got $t")
    val qs = quasiCols.map(col)
    val dec = "decimal(38,0)"
    val scale = (1L << 20).toDouble
    // U+001F (unit separator) keys the combo through the shared
    // cumulative machinery; quasi columns join back at the end
    val sep = "\u001f"
    val slim = graft.util.Caches.persist(
      df.where(quasiCols.map(col(_).isNotNull).reduce(_ && _)
          && col(sensitiveCol).isNotNull)
        .select(concat_ws(sep, qs.map(_.cast("string")): _*).as("grp"),
          col(sensitiveCol).cast("double").as("v"))
        .groupBy("grp", "v").agg(count(lit(1)).as("__cgv")))
    // corpus marginals: per-value counts + the global cumulative (one
    // value-cardinality window)
    val corpus = graft.util.Caches.persist(
      slim.groupBy("v").agg(sum("__cgv").as("__cv"))
        .select(col("v"), col("__cv"),
          sum("__cv").over(org.apache.spark.sql.expressions.Window
            .orderBy("v")).as("__cum"),
          count(lit(1)).over().as("__m"),
          sum("__cv").over().as("__n")))
    val groups = slim.groupBy("grp").agg(sum("__cgv").as("__ng"))
    // audit grid: every combo x every corpus value (cum_g is defined at
    // values the group lacks), cumulated per group with the skew guard
    val grid = groups.select("grp")
      .crossJoin(corpus.select("v"))
      .join(slim, Seq("grp", "v"), "left")
      .select(col("grp"), col("v"),
        coalesce(col("__cgv"), lit(0L)).as("__na"), lit(0L).as("__nb"))
    val cum = Drift.cumulativeByGroup(grid, withNext = false,
      maxGroupDistinct)
    val raw = col("__ca").cast(dec) * col("__n").cast(dec) -
      col("__cum").cast(dec) * col("__ng").cast(dec)
    val contrib = when(raw < 0, -raw).otherwise(raw).cast("double") /
      (col("__ng").cast("double") * col("__n").cast("double"))
    val perGroup = cum
      .join(corpus.select("v", "__cum", "__m", "__n"), "v")
      .join(groups, "grp")
      // the last value's cumulative difference is identically 0; the
      // paper's sum runs i = 1..m-1
      .select(col("grp"), col("__ng"), col("__m"),
        when(col("__cum") < col("__n"),
          round(contrib * scale).cast("long")).as("__t"))
      .groupBy("grp")
      .agg(max("__ng").as("group_n"), max("__m").as("n_values"),
        sum("__t").as("__fp"))
      .select(col("grp"), col("group_n"), col("n_values"),
        (round(when(col("n_values") > 1,
            col("__fp").cast("double") / scale /
              (col("n_values") - 1).cast("double"))
          .otherwise(0d), 6) + lit(0d)).as("emd"))
    // map the combo key back to the original quasi columns
    val combos = df
      .where(quasiCols.map(col(_).isNotNull).reduce(_ && _)
        && col(sensitiveCol).isNotNull)
      .select(qs :+
        concat_ws(sep, qs.map(_.cast("string")): _*).as("grp"): _*)
      .distinct()
    perGroup.join(combos, "grp")
      .select(qs ++ Seq(col("group_n"), col("n_values"), col("emd"),
        (col("emd") > t).as("at_risk")): _*)
  }

  /** Generalized randomized response + frequency estimation (Warner
    * 1965; the k-ary GRR of Kairouz et al. 2016) — LOCAL differential
    * privacy beside [[noisyCounts]]' central-DP Laplace: each record
    * perturbs its OWN categorical value before any aggregation (report
    * the truth with probability p = pNum/pDen, else one of the other
    * d−1 domain values uniformly), so the collector never holds a true
    * row; the aggregate then inverts the known noise:
    *
    *   n̂_c = (y_c·pDen·(d−1) − n·(pDen−pNum)) / (pNum·d − pDen)
    *
    * — the unbiased GRR frequency oracle, exact integer numerator and
    * denominator, one final 6dp double division. The privacy level is
    * ε = ln(p(d−1)/(1−p)).
    *
    * Deterministic pin (the oracle replays it): the keep-draw compares
    * the exactly-uniform raw 32-bit hash of `id:salt` against
    * floor(p·2³²) — an exact Bernoulli(p) — and the replacement draw
    * indexes the OTHER sorted domain values by h32raw(id:salt:pick)
    * mod (d−1) (modulo bias O(d/2³²), deterministic). Swap the salt
    * per release for fresh draws.
    *
    * Output per domain value: (value, n_reported, n_est). Requires
    * p > 1/d (pNum·d > pDen) or the estimator is degenerate — loud.
    * Shape at scale: ONE bounded domain collect (≤ maxDomain, loud),
    * the mechanism as a narrow broadcast-rank projection, one
    * map-side-combined count — no window, no pairs.
    */
  def randomizedResponseCounts(df: DataFrame, idCol: String,
      valueCol: String, pNum: Long = 3, pDen: Long = 4,
      maxDomain: Int = 1024, salt: String = "rr"): DataFrame = {
    require(pNum > 0 && pDen > pNum,
      s"need 0 < pNum < pDen, got $pNum/$pDen")
    import graft.functions.{TextFunctions => T}
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("string").as("__v"))
    val domain = rows.select(col("__v")).distinct()
      .orderBy("__v").limit(maxDomain + 1)
      .as[String].collect().toSeq
    require(domain.size <= maxDomain,
      s"randomizedResponse: domain exceeds maxDomain=$maxDomain — GRR " +
        "is a small-domain mechanism; hash or bucket the column first")
    val d = domain.size
    require(d >= 2, s"need >= 2 domain values, got $d")
    require(pNum * d > pDen,
      s"estimator degenerate: need p > 1/d, got p=$pNum/$pDen at d=$d")
    val keepThreshold = (BigInt(pNum) * BigInt(2).pow(32) / BigInt(pDen))
      .toLong
    val rank = broadcast(domain.zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("__v", "__rank"))
    val domainArr = array(domain.map(lit): _*)
    val reported = rows.join(rank, Seq("__v"))
      .select(
        when(T.h32raw(concat(col("__id"), lit(s":$salt"))) < keepThreshold,
          col("__v"))
          .otherwise {
            val pick = T.h32raw(concat(col("__id"), lit(s":$salt:pick"))) % (d - 1)
            // index into the sorted domain MINUS the true value
            element_at(domainArr,
              (when(pick < col("__rank"), pick).otherwise(pick + 1) + 1)
                .cast("int"))
          }.as("reported"))
    val counts = reported.groupBy(col("reported").as("value"))
      .agg(count(lit(1)).as("n_reported"))
    val tot = counts.agg(coalesce(sum("n_reported"), lit(0L)).as("__n"))
    broadcast(rank.select(col("__v").as("value")))
      .join(counts, Seq("value"), "left")
      .crossJoin(broadcast(tot))
      .select(col("value"),
        coalesce(col("n_reported"), lit(0L)).as("n_reported"),
        (round((coalesce(col("n_reported"), lit(0L)) * pDen * (d - 1)
            - col("__n") * (pDen - pNum)).cast("double")
          / (pNum * d - pDen), 6) + lit(0d)).as("n_est"))
  }
}

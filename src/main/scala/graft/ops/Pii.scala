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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation for web-crawl corpora — the two ops every
  * crawl-derived training set needs before [[Dedup]] and the
  * [[Sampling]] mixture knobs can do their jobs: exact-dedup on RAW
  * URLs misses the same page behind `HTTP://Example.com:80/a/` vs
  * `http://example.com/a?utm_source=x`, and domain-mix policy (cap
  * boilerplate farms, upweight reference domains) needs a per-domain
  * share report keyed on the CANONICAL host.
  *
  * [[normalize]]'s rule list is PINNED (documented here, replayed
  * verbatim in the oracle; no library URI parser on either engine):
  *   1. fragment strip (`#...` — never reaches the server);
  *   2. scheme and authority lowercase (the authority ends at the
  *      FIRST `/` or `?` after `://` — a query can follow the host
  *      with no path at all);
  *   3. default-port strip (`:80` for http, `:443` for https — only
  *      the scheme's OWN default);
  *   4. trailing-slash strip on the path (`/a/` == `/a`; the root path
  *      collapses to no path at all);
  *   5. tracking-parameter strip: any `utm_*` name, plus
  *      `gclid`/`fbclid`/`msclkid`/`ref`, names compared
  *      CASE-INSENSITIVELY (crawls carry `UTM_Source=` variants; the
  *      param VALUE and surviving names keep their original case) —
  *      surviving params keep their
  *      ORIGINAL order (no re-sort: param order is semantics for some
  *      endpoints, and a pinned no-op beats a second convention).
  * Rows without `://` normalize to NULL (malformed-by-contract, loud in
  * any downstream groupBy). Everything is built from codegen-friendly
  * string expressions except the one param-filter HOF, which is staged
  * in its own projection (the wordShingles convention).
  *
  * Shape at scale: [[normalize]] is a pure narrow projection — zero
  * shuffle, linear scan. [[domainMix]] is one map-side-combined
  * domain-keyed aggregate plus a one-row totals broadcast — the
  * report is domain-cardinality-sized, never corpus-sized, and feeds
  * straight into [[Sampling.perStratumTokenCap]] / [[Sampling.rebalance]]
  * as the stratum table.
  */
object Url {

  private val TrackingExact = Seq("gclid", "fbclid", "msclkid", "ref")

  /** 1-based position where the authority of `rest` (the post-`://`
    * text, fragment already stripped) ENDS: the first `/` or `?`,
    * whichever comes first, or one past the end when neither appears.
    * Shared by [[normalize]] and [[domainOf]]; the oracle CTEs replay
    * the identical three-way CASE.
    */
  private def authorityEnd(rest: Column): Column = {
    val slashPos = instr(rest, "/")
    val qPos = instr(rest, "?")
    when(slashPos > 0 && (qPos === 0 || slashPos < qPos), slashPos)
      .when(qPos > 0, qPos)
      .otherwise(length(rest) + 1)
  }

  /** Canonical form of `urlCol` appended as `url_norm` (NULL when the
    * value has no `://`). Rules pinned in the object doc.
    */
  def normalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    // 1. fragment strip, then scheme/rest split on the FIRST '://'
    val noFrag = split_part(u, lit("#"), lit(1))
    val staged = df
      .withColumn("__nofrag", noFrag)
      .withColumn("__scheme",
        when(instr(col("__nofrag"), "://") > 0,
          lower(split_part(col("__nofrag"), lit("://"), lit(1)))))
      .withColumn("__rest",
        substring(col("__nofrag"),
          instr(col("__nofrag"), "://") + 3, lit(1000000)))
    // 2-3. authority ends at the FIRST of '/' or '?' (a query can
    // follow the host with NO path at all — splitting on '/' alone
    // would glue the query onto the authority); lowercase, strip the
    // scheme's own default port
    val restC = col("__rest")
    val auth0 = lower(substring(restC, lit(1), authorityEnd(restC) - 1))
    val auth = when(col("__scheme") === "http",
        regexp_replace(auth0, ":80$", ""))
      .when(col("__scheme") === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    // 4. path/query split; trailing-slash strip on the path
    val pathq = substring(restC, authorityEnd(restC), lit(1000000))
    val path = regexp_replace(split_part(pathq, lit("?"), lit(1)),
      "/+$", "")
    val query = when(instr(pathq, "?") > 0,
      substring(pathq, instr(pathq, "?") + 1, lit(1000000)))
    // 5. tracking-param strip — the HOF input staged in its own
    // projection so the split evaluates once per row
    staged
      .withColumn("__auth", auth)
      .withColumn("__path", path)
      .withColumn("__params",
        when(query.isNotNull, split(query, "&")).otherwise(array()))
      .withColumn("__kept", expr(
        "filter(__params, p -> not (left(lower(split_part(p, '=', 1)), 4) " +
          "= 'utm_' or lower(split_part(p, '=', 1)) in (" +
          TrackingExact.map(t => s"'$t'").mkString(", ") + ")))"))
      .withColumn("url_norm",
        when(col("__scheme").isNull, lit(null).cast("string"))
          .otherwise(concat(
            col("__scheme"), lit("://"), col("__auth"), col("__path"),
            when(size(col("__kept")) > 0,
              concat(lit("?"), array_join(col("__kept"), "&")))
              .otherwise(lit("")))))
      .drop("__nofrag", "__scheme", "__rest", "__auth", "__path",
        "__params", "__kept")
  }

  /** Canonical registrable-host of `urlCol` as a Column: lowercase
    * authority minus port minus one leading `www.` (NULL without
    * `://`). The [[domainMix]] key, exposed for composition.
    */
  def domainOf(u: Column): Column = {
    val noFrag = split_part(u, lit("#"), lit(1))
    val rest = substring(noFrag, instr(noFrag, "://") + 3, lit(1000000))
    val auth = lower(substring(rest, lit(1), authorityEnd(rest) - 1))
    when(instr(noFrag, "://") > 0,
      regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", ""))
  }

  /** Per-domain doc/token share report: (domain, n_docs, doc_share,
    * n_tokens, token_share), the mixture-policy input table. Token
    * counts come from `tokenCol` (exact long sums); shares are one
    * double division each against the one-row broadcast totals. NULL
    * domains (malformed URLs) form their own row — a crawl segment
    * going malformed IS a mix shift.
    */
  /** Empirical-Bayes (m-estimate) per-domain quality rates — the
    * crawl-curation scorer that fixes the small-domain problem raw
    * rates have: a domain with 2 docs, both passing a quality screen,
    * reads 1.0 raw and outranks a 10k-doc domain at 0.95, so
    * rate-ranked keeps/blocks thrash on the long tail. Shrinkage
    * toward the corpus rate p₀ with pseudo-count weight `m`:
    * score_d = (k_d + m·p₀) / (n_d + m) — tiny domains read ≈ p₀,
    * big domains keep their own rate (the classic m-estimate /
    * Dirichlet-smoothing form). `goodCol` is any boolean quality
    * verdict (a [[TextAnalysis]] filter output, a classifier flag);
    * NULL verdicts drop (not judged, not counted).
    *
    * Determinism: counts exact longs; p₀ is one double division of
    * the one-row broadcast totals; the score one pinned-order double
    * expression, rounded 6dp. Shape at scale: one map-side-combined
    * domain-keyed aggregate + the totals broadcast —
    * domain-cardinality-sized like [[domainMix]]. Output per domain:
    * (domain, n_docs, k_good, rate_raw, rate_corpus, rate_shrunk).
    */
  def domainQuality(df: DataFrame, urlCol: String, goodCol: String,
      m: Double = 20.0): DataFrame = {
    require(m > 0, s"pseudo-count weight m must be > 0, got $m")
    val slim = df.where(col(goodCol).isNotNull)
      .select(domainOf(col(urlCol)).as("domain"),
        when(col(goodCol).cast("boolean"), 1L).otherwise(0L).as("__g"))
    val per = slim.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("__g").as("k_good"))
    val tot = per.agg(sum("n_docs").as("__tn"), sum("k_good").as("__tk"))
    val p0 = col("__tk").cast("double") / col("__tn").cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("k_good"),
        (round(col("k_good").cast("double")
          / col("n_docs").cast("double"), 6) + lit(0d)).as("rate_raw"),
        (round(p0, 6) + lit(0d)).as("rate_corpus"),
        (round((col("k_good").cast("double") + lit(m) * p0)
          / (col("n_docs").cast("double") + lit(m)), 6) + lit(0d))
          .as("rate_shrunk"))
  }

  /** Domain-gated row filter — [[domainQuality]] CONSUMED (round 17):
    * keep only the rows whose canonical domain's m-estimate quality
    * rate clears `minShrunk`; the curation chain's domain front door
    * (block the boilerplate farm BEFORE paying dedup/quality compute
    * for its pages). Rows whose URL is malformed (NULL domain) drop —
    * a page that can't name its domain never passes a domain gate.
    * The comparison uses the ROUNDED `rate_shrunk` (the reported
    * value, so the kept set is exactly reproducible from the
    * [[domainQuality]] report). Output: (domain, input columns…,
    * rate_shrunk).
    *
    * Shape at scale: the score table is domain-cardinality-sized and
    * BROADCASTS; the corpus itself never shuffles — one narrow
    * projection plus a broadcast-hash join.
    */
  def domainFilter(df: DataFrame, urlCol: String, goodCol: String,
      minShrunk: Double, m: Double = 20.0): DataFrame = {
    require(minShrunk >= 0 && minShrunk <= 1,
      s"minShrunk must be in [0,1], got $minShrunk")
    val scores = domainQuality(df, urlCol, goodCol, m)
      .where(col("domain").isNotNull && col("rate_shrunk") >= minShrunk)
      .select(col("domain"), col("rate_shrunk"))
    df.withColumn("domain", domainOf(col(urlCol)))
      .join(broadcast(scores), Seq("domain"))
  }

  def domainMix(df: DataFrame, urlCol: String,
      tokenCol: String): DataFrame = {
    val per = df
      .select(domainOf(col(urlCol)).as("domain"),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("__tok"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("__tok").as("n_tokens"))
    val tot = per.agg(sum("n_docs").as("__td"), sum("n_tokens").as("__tt"))
    per.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"),
        (round(col("n_docs").cast("double") / col("__td"), 6) + lit(0d))
          .as("doc_share"),
        col("n_tokens"),
        (round(col("n_tokens").cast("double") / col("__tt"), 6) + lit(0d))
          .as("token_share"))
  }
}

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
  *   2. scheme and authority lowercase;
  *   3. default-port strip (`:80` for http, `:443` for https — only
  *      the scheme's OWN default);
  *   4. trailing-slash strip on the path (`/a/` == `/a`; the root path
  *      collapses to no path at all);
  *   5. tracking-parameter strip: any `utm_*` name, plus
  *      `gclid`/`fbclid`/`msclkid`/`ref` — surviving params keep their
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
    // 2-3. authority: lowercase, strip the scheme's own default port
    val auth0 = lower(split_part(col("__rest"), lit("/"), lit(1)))
    val auth = when(col("__scheme") === "http",
        regexp_replace(auth0, ":80$", ""))
      .when(col("__scheme") === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    // 4. path/query split; trailing-slash strip on the path
    val pathq = substring(col("__rest"),
      length(split_part(col("__rest"), lit("/"), lit(1))) + 1, lit(1000000))
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
        "filter(__params, p -> not (left(split_part(p, '=', 1), 4) " +
          "= 'utm_' or split_part(p, '=', 1) in (" +
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
    val auth = lower(split_part(rest, lit("/"), lit(1)))
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

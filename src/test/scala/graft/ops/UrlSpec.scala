package graft.ops

import org.apache.spark.sql.functions._

/** Pins for the URL curation ops: every rule of [[Url.normalize]]'s
  * pinned list on hand-written URLs, the NULL-on-malformed contract,
  * order preservation of surviving params, and [[Url.domainMix]]'s
  * share arithmetic.
  */
class UrlSpec extends graft.SparkSpec {
  import spark.implicits._

  private def norm(url: String): String = {
    val r = Url.normalize(Seq(url).toDF("url"), "url")
      .select("url_norm").collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("normalize: every pinned rule on hand cases") {
    // scheme/host case + https default port + trailing slash +
    // tracking strip + fragment strip, all at once
    assert(norm("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=3#frag")
      == "https://www.ex.com/a/b?id=3")
    // http default port; root path collapses entirely
    assert(norm("HTTP://ex.com:80/") == "http://ex.com")
    // a NON-default port survives; so does a cross-scheme default
    assert(norm("http://ex.com:8080/a") == "http://ex.com:8080/a")
    assert(norm("https://ex.com:80/a") == "https://ex.com:80/a")
    // all-tracking query drops the '?' entirely
    assert(norm("https://ex.com/p?utm_a=1&ref=2&gclid=9&fbclid=z&msclkid=m")
      == "https://ex.com/p")
    // surviving params keep their ORIGINAL order — no re-sort
    assert(norm("https://ex.com/p?b=2&utm_x=0&a=1")
      == "https://ex.com/p?b=2&a=1")
    // path case is PRESERVED (only scheme/authority fold)
    assert(norm("https://EX.com/CaseSensitive/Path")
      == "https://ex.com/CaseSensitive/Path")
    // a param named utm_ via prefix, vs one merely containing it
    assert(norm("https://ex.com/p?xutm_a=1") == "https://ex.com/p?xutm_a=1")
    // a query with NO path: the '?' (not '/') ends the authority, so
    // port strip + tracking strip still run and the query never
    // lowercases into the host
    assert(norm("HTTP://Ex.COM:80?utm_source=x&id=1")
      == "http://ex.com?id=1")
    assert(norm("https://ex.com?a=B") == "https://ex.com?a=B")
    // tracking-name match is CASE-INSENSITIVE (values keep case)
    assert(norm("https://ex.com/p?UTM_Source=x&Ref=r&GCLID=g&id=Q")
      == "https://ex.com/p?id=Q")
    // malformed (no scheme separator) -> NULL, loud downstream
    assert(norm("ex.com/a") == null)
  }

  test("domainOf: lowercase, port strip, ONE www strip") {
    val d = Seq(
      "HTTP://WWW.Sub.Ex.COM:8080/x",
      "https://ex.com/y",
      "https://www.www.ex.com/z", // only the first www. strips
      "nonsense",
      "http://Ex.COM:80?utm_source=x&id=1" // query, NO path
      ).toDF("url")
      .select(Url.domainOf(col("url")).as("d")).collect()
    assert(d(0).getString(0) == "sub.ex.com")
    assert(d(1).getString(0) == "ex.com")
    assert(d(2).getString(0) == "www.ex.com")
    assert(d(3).isNullAt(0))
    assert(d(4).getString(0) == "ex.com")
  }

  test("domainMix: domain-keyed counts, exact token sums, shares sum " +
      "to 1, NULL domain is its own row") {
    val df = Seq(
      ("https://a.com/1", 10L), ("https://WWW.A.com:443/2", 20L),
      ("http://b.com/1", 30L), ("garbage", 40L)).toDF("url", "tok")
    val out = Url.domainMix(df, "url", "tok").orderBy("domain").collect()
    assert(out.length == 3)
    val byDom = out.map(r => Option(r.getString(0)).getOrElse("(null)") ->
      (r.getLong(1), r.getLong(3))).toMap
    assert(byDom("a.com") == ((2L, 30L)))
    assert(byDom("b.com") == ((1L, 30L)))
    assert(byDom("(null)") == ((1L, 40L)))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("domainQuality: m-estimate shrinkage re-ranks the tiny perfect " +
      "domain below the big reliable one; NULL verdicts drop") {
    // a: 100 docs / 95 good (.95), b: 2 / 2 (1.0 raw), c: 100 / 10
    // junk -> p0 = 107/202 ≈ .53; shrunk must rank a > b > c while raw
    // ranks b > a > c — the small-domain fix this op exists for
    def doc(dom: String, good: java.lang.Boolean) =
      (s"https://$dom/x", good)
    val rows =
      (0 until 100).map(i => doc("a.com", i < 95)) ++
        (0 until 2).map(_ => doc("b.com", true)) ++
        (0 until 100).map(i => doc("c.com", i < 10)) :+
        doc("a.com", null) // unjudged: must not count
    val df = rows.toDF("url", "good")
    val out = Url.domainQuality(df, "url", "good").orderBy("domain")
      .collect()
    val byDom = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5))).toMap
    assert(byDom("a.com")._1 == 100L) // the NULL verdict dropped
    assert(byDom("b.com")._3 == 1.0 && byDom("a.com")._3 == 0.95)
    // pinned recompute of the m-estimate
    val p0 = 107.0 / 202.0
    def shrunk(k: Double, n: Double) = graft.functions.PValues.round6(
      (k + 20.0 * p0) / (n + 20.0))
    assert(byDom("a.com")._4 == shrunk(95, 100))
    assert(byDom("b.com")._4 == shrunk(2, 2))
    assert(byDom("c.com")._4 == shrunk(10, 100))
    // the ranking flip
    assert(byDom("b.com")._3 > byDom("a.com")._3)
    assert(byDom("a.com")._4 > byDom("b.com")._4)
    assert(byDom("b.com")._4 > byDom("c.com")._4)
    intercept[IllegalArgumentException](
      Url.domainQuality(df, "url", "good", m = 0.0))
  }

  test("domainFilter: keeps exactly the rows whose domain clears the " +
      "shrunk-rate threshold; malformed URLs and unjudged-only domains " +
      "drop; the score join BROADCASTS") {
    def doc(dom: String, good: java.lang.Boolean) =
      (s"https://$dom/x", good)
    // a.com: 100/95 (shrunk ≈ .91 clears .7); b.com: 2/2 (shrunk ≈ .55
    // fails .7 — the tiny perfect domain the m-estimate demotes);
    // c.com: 100/10 fails; plus a malformed row and a NULL verdict
    val rows = (0 until 100).map(i => doc("a.com", i < 95)) ++
      (0 until 2).map(_ => doc("b.com", true)) ++
      (0 until 100).map(i => doc("c.com", i < 10)) :+
      doc("a.com", null) :+ (("garbage", java.lang.Boolean.TRUE))
    val df = rows.toDF("url", "good")
    val kept = Url.domainFilter(df, "url", "good", minShrunk = 0.7)
    val byDom = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ALL a.com rows keep — including the unjudged one (the gate is on
    // the domain, not the row)
    assert(byDom == Map("a.com" -> 101L))
    assert(kept.columns.contains("rate_shrunk"))
    // threshold 0 keeps every well-formed row (100 + 2 + 100 + the
    // unjudged one = 203); garbage still drops
    assert(Url.domainFilter(df, "url", "good", 0.0).count() == 203L)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the domain score table must broadcast:\n$plan")
    intercept[IllegalArgumentException](
      Url.domainFilter(df, "url", "good", 1.5))
  }

  test("normalize is layout-invariant and a pure projection (no shuffle)") {
    val urls = (0 until 100).map(i =>
      s"HTTPS://WWW.s$i.Ex.COM:443/p/$i/?utm_c=$i&id=$i#f")
    val a = Url.normalize(urls.toDF("url"), "url")
      .select("url_norm").collect().map(_.getString(0)).sorted.toSeq
    val b = Url.normalize(urls.toDF("url").repartition(7), "url")
      .select("url_norm").collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
    // plan shape: no Exchange anywhere in a normalize-only plan
    val plan = Url.normalize(urls.toDF("url"), "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
  }
}

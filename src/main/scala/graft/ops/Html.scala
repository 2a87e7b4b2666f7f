package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → clean-text extraction — the web-curation front door: real
  * crawl corpora arrive as markup, and the engine's quality/dedup
  * chain starts at clean text. This is the jusText/trafilatura SHAPE
  * (Pomikálek 2011: classify markup BLOCKS by stopword density and
  * link density, keep the content blocks, drop the boilerplate) as
  * pinned integer rules over codegen'd string expressions — no parser
  * object, no UDF, and every rule replays verbatim in the DuckDB
  * oracle:
  *
  *  1. STRIP non-content: <script>…</script>, <style>…</style> and
  *     <!-- comments --> are removed bodily (lazy-quantifier regexes,
  *     RE2-compatible — no backreferences).
  *  2. SEGMENT into blocks at block-level tags (p, div, h1-6, li, ul,
  *     ol, table, tr, td, th, br, section, article, header, footer,
  *     nav, blockquote): each such tag becomes a U+001E record
  *     separator, then one split. Inline tags (a, b, i, span, …) do
  *     NOT break blocks — exactly jusText's block notion.
  *  3. PER BLOCK, on the tag-stripped, entity-decoded, whitespace-
  *     squeezed text: n_words (whitespace words), n_stop (members of
  *     the pinned stopword list, counted via the doubled-space trick
  *     so consecutive stopwords never share a boundary), and n_links
  *     (<a …> anchor openings in the RAW block).
  *  4. KEEP a block iff n_words >= minWords AND n_stop·100 >=
  *     stopPct·n_words AND n_links·linkWordRatio <= n_words — the
  *     jusText good-block rule in exact integer space (stopword-dense
  *     prose with few links per word); navigation bars, footers and
  *     "click here" promos fail on links or stopwords.
  *
  * Entity decoding is the pinned 6-entity set (&nbsp; &lt; &gt;
  * &quot; &#39; and &amp; LAST, the standard double-decode-safe
  * order); full numeric-entity decoding belongs to a charset layer,
  * not a block classifier.
  *
  * Output (row-preserving, one row per input doc): (doc_id, n_blocks,
  * n_kept, n_words, text) — n_blocks counts non-empty blocks, n_words
  * sums KEPT block words, text is the kept blocks joined by single
  * spaces in document order ('' when nothing survives, never null).
  *
  * Shape at scale: strip/segment/classify are narrow codegen'd string
  * projections; the only shuffle is the one groupBy(doc_id) that
  * reassembles kept blocks (ordered struct sort inside the collected
  * list — the [[Assemble.threads]] idiom). No window, no join, no
  * driver state; 100 TB of crawl HTML maps and reduces once.
  */
object Html {

  /** Pinned keep-rule stopwords (lowercase). Function words only: the
    * signal is "does this block read like prose", not topicality.
    */
  val DefaultStopwords: Seq[String] =
    Seq("a", "the", "to", "of", "and", "in", "is", "it")

  private val RS = "\u001E" // block record separator

  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|section|article|header" +
      "|footer|nav|blockquote"

  /** Tag-stripped, entity-decoded, squeezed text of a raw block. */
  private def blockText(raw: Column): Column = {
    val noTags = regexp_replace(raw, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Stopword occurrences in a squeezed lowercase-able text: double
    * every space first so consecutive stopwords each own their
    * boundary spaces, then count non-overlapping ' sw ' hits — pure
    * length arithmetic, identical in any engine.
    */
  private def stopCount(bt: Column, stopwords: Seq[String]): Column = {
    val dbl = replace(concat(lit(" "), lower(bt), lit(" ")),
      lit(" "), lit("  "))
    stopwords.map { sw =>
      (length(dbl) - length(replace(dbl, lit(s" $sw "), lit("")))) /
        lit(sw.length + 2)
    }.reduce(_ + _).cast("long")
  }

  def extract(df: DataFrame, idCol: String, htmlCol: String,
      stopwords: Seq[String] = DefaultStopwords, minWords: Int = 3,
      stopPct: Int = 5, linkWordRatio: Int = 3): DataFrame = {
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    require(stopwords.forall(sw => sw.nonEmpty && sw == sw.toLowerCase
        && !sw.contains(" ")),
      "stopwords must be lowercase single words")
    require(minWords >= 1 && stopPct >= 0 && linkWordRatio >= 0,
      "thresholds must be non-negative (minWords >= 1)")

    val html = translate(col(htmlCol), RS, "") // sentinel-safe
    val noJunk = Seq(
      "(?is)<script([ \\t\\n\\r][^>]*)?>.*?</script[ \\t\\n\\r]*>",
      "(?is)<style([ \\t\\n\\r][^>]*)?>.*?</style[ \\t\\n\\r]*>",
      "(?s)<!--.*?-->")
      .foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val segmented = regexp_replace(noJunk,
      s"(?i)</?($BlockTags)([ \\t\\n\\r][^>]*)?/?>", RS)

    val blocks = df
      .select(col(idCol).as("doc_id"), split(segmented, RS).as("__bl"))
      .select(col("doc_id"), posexplode_outer(col("__bl"))
        .as(Seq("__i", "__raw")))
    val bt = blockText(col("__raw"))
    val scored = blocks.select(col("doc_id"), col("__i"), bt.as("__bt"),
        size(regexp_extract_all(col("__raw"), lit("(?i)<a[ >]"), lit(0)))
          .cast("long").as("__links"))
      .withColumn("__nw",
        when(col("__bt").isNull || col("__bt") === "", lit(0L))
          .otherwise(size(split(col("__bt"), " ")).cast("long")))
      .withColumn("__nstop",
        when(col("__nw") === 0L, lit(0L))
          .otherwise(stopCount(col("__bt"), stopwords)))
      .withColumn("__keep",
        col("__nw") >= minWords.toLong &&
          col("__nstop") * 100L >= col("__nw") * stopPct.toLong &&
          col("__links") * linkWordRatio.toLong <= col("__nw"))

    scored.groupBy("doc_id")
      .agg(
        sum(when(col("__nw") > 0L, 1L).otherwise(0L)).as("n_blocks"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), col("__nw")).otherwise(0L)).as("n_words"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("__i"), col("__bt").as("__t"))))),
          s => s.getField("__t"))).as("text"))
  }
}

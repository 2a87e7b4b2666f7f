package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String) =
    Html.extract(Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().head

  test("script/style/comments are stripped bodily, inline tags do not " +
      "break blocks, block tags do") {
    val r = one("<html><body>" +
      "<script type=\"x\">the a of junk junk</script>" +
      "<style>p { the a of }</style>" +
      "<!-- the a of comment -->" +
      "<p>the quick fox is in the <b>box</b> today</p>" +
      "</body></html>")
    // one content block; script/style/comment words must NOT appear
    assert(r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[String]("text") ==
      "the quick fox is in the box today")
    assert(r.getAs[Long]("n_words") == 8L)
  }

  test("keep rule: link-dense nav and short headings drop; " +
      "stopword-poor word salad drops; prose keeps") {
    val r = one("<body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
      "<a href=\"/b\">Docs</a></nav>" +
      "<h1>Short title</h1>" +
      "<p>alpha beta gamma delta epsilon zeta eta theta</p>" +
      "<p>the cat sat on a mat and it was flat</p>" +
      "</body>")
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[String]("text") == "the cat sat on a mat and it was flat")
  }

  test("entity decoding is the pinned 6-entity set with &amp; last") {
    val r = one("<p>a &lt;tag&gt; &quot;quoted&quot; &#39;x&#39; " +
      "b&nbsp;c &amp;lt; the end of it</p>")
    // &amp;lt; decodes to &lt; (literally), NOT to '<' — amp is last
    assert(r.getAs[String]("text") ==
      "a <tag> \"quoted\" 'x' b c &lt; the end of it")
  }

  test("stopword density uses the doubled-space trick: consecutive " +
      "stopwords all count") {
    // 'a of the in it is to of' — 8/8 stopwords, passes easily; the
    // naive non-overlapping count would miss every second one
    val keep = one("<p>a of the in it is to of</p>")
    assert(keep.getAs[Long]("n_kept") == 1L)
    // same words but diluted below 5%: 1 stopword in 24 words
    val salad = (1 to 23).map(i => s"w$i").mkString(" ") + " the"
    val drop = one(s"<p>$salad</p>")
    assert(drop.getAs[Long]("n_kept") == 0L)
    assert(drop.getAs[String]("text") == "")
  }

  test("row preservation: no-block and null-html docs still emit a row") {
    val df = Seq((1L, Option("<p>the a of x</p>")), (2L, Option("")),
      (3L, Option.empty[String]))
      .toDF("doc_id", "html")
    val out = Html.extract(df, "doc_id", "html").orderBy("doc_id")
      .collect()
    assert(out.length == 3)
    assert(out(1).getAs[Long]("n_blocks") == 0L &&
      out(1).getAs[String]("text") == "")
    assert(out(2).getAs[Long]("n_kept") == 0L)
  }

  test("kept blocks join in document order; U+001E in input cannot " +
      "forge a block boundary") {
    val r = one("<p>the first block is a keeper</p>" +
      "<div>drop me</div>" +
      "<p>the second block is a keeper too</p>")
    assert(r.getAs[String]("text") ==
      "the first block is a keeper the second block is a keeper too")
    val forged = one("<p>the a of x \u001E forged</p>")
    assert(forged.getAs[Long]("n_blocks") == 1L)
  }

  test("result is independent of input partitioning") {
    val docs = (1 to 40).map(i =>
      (i.toLong, s"<nav><a href=x>L</a></nav><p>the word w$i is in a box</p>"))
      .toDF("doc_id", "html")
    val a = Html.extract(docs, "doc_id", "html")
      .orderBy("doc_id").collect()
    val b = Html.extract(docs.repartition(7), "doc_id", "html")
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}

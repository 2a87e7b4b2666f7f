package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "a b a b a b a b", "en"),     // maximally predictable
    (1L, "a b c d e f g h", "en"),     // every bigram is rare
    (2L, "a b a b c d a b", "en"),
    (3L, "solo", "en"),                // one word: no bigrams, not scored
    (4L, "x y x y x y", "de")
  ).toDF("doc_id", "text", "lang")

  test("bigram cross-entropy: counts, exclusions, predictability ordering") {
    val out = LanguageModel.bigramCrossEntropy(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // docs with >= 2 words score; the 1-word doc is absent
    assert(out.keySet == Set(0L, 1L, 2L, 4L))
    // n_bigrams = words - 1
    assert(out(0L)._1 == 7 && out(1L)._1 == 7 && out(4L)._1 == 5)
    // the repetitive doc is more predictable under the corpus model than
    // the one whose bigrams each occur once
    assert(out(0L)._2 < out(1L)._2,
      s"expected xent(repetitive) < xent(diverse): $out")
    assert(out.values.forall(_._2 >= 0.0), s"xent must be >= 0: $out")
  }

  test("hand-replay of the smoothed model on a 2-doc corpus") {
    val tiny = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramCrossEntropy(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // bigrams: doc0 = {ab:2, ba:1}, doc1 = {ac:1}
    // c12: ab=2, ba=1, ac=1; c1: a=3, b=1; V = |{a,b,c}| = 3
    val V = 3.0
    def lp6(c12: Long, c1: Long): Long =
      math.round(math.log((c12 + 0.1) / (c1 + 0.1 * V)) * 1e6)
    val ab = lp6(2, 3); val ba = lp6(1, 1); val ac = lp6(1, 3)
    def xent(s: Long, n: Long): Double =
      BigDecimal(-s.toDouble / 1e6 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) == ((3L, xent(2 * ab + ba, 3))), s"doc0: ${out(0L)}")
    assert(out(1L) == ((1L, xent(ac, 1))), s"doc1: ${out(1L)}")
  }

  test("per-group models are independent: grouped == per-subset runs") {
    val grouped = LanguageModel.bigramCrossEntropy(
      corpus, "doc_id", "text", groupCols = Seq("lang"))
    for (lang <- Seq("en", "de")) {
      val solo = LanguageModel.bigramCrossEntropy(
        corpus.where($"lang" === lang), "doc_id", "text")
      val g = grouped.join(corpus.where($"lang" === lang), "doc_id")
        .select("doc_id", "n_bigrams", "xent")
      assert(datasetEquality(solo, g), s"lang $lang diverges")
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality metrics on a known string") {
    val df = Seq((1L, "the cat! sat.")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_chars") == 13L)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("n_distinct_words") == 3L)
    assert(r.getAs[Double]("ttr") == 1.0)
    assert(r.getAs[Double]("stopword_ratio") == 0.333333) // "the"/3, 6dp
    assert(r.getAs[Double]("punct_ratio") == 0.153846)    // "!." = 2/13
    assert(r.getAs[Double]("mean_word_len") == 3.666667)  // (13-3+1)/3
  }

  test("quality filter keeps schema and applies every threshold inclusively") {
    val df = Seq(
      (1L, "the cat sat on a mat today fine day ok"),   // 10 words, passes
      (2L, "x"),                                        // too short
      (3L, "the the the the the the the the the the")   // ttr 0.1 < minTtr
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(df, "text",
      minChars = 1, maxChars = 100, minWords = 5, minTtr = 0.5,
      minStopwordRatio = 0.0, maxPunctRatio = 0.5)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // filter agrees with what quality() reports: thresholds compare the
    // same 6dp-rounded values
    val ttr3 = TextAnalysis.quality(df.where($"doc_id" === 3L), "doc_id", "text")
      .head().getAs[Double]("ttr")
    assert(TextAnalysis.qualityFilter(df.where($"doc_id" === 3L), "text",
      minChars = 1, maxChars = 100, minWords = 1, minTtr = ttr3,
      minStopwordRatio = 0.0, maxPunctRatio = 1.0).count() == 1)
  }

  test("token counts: whitespace vs BPE-ish regex tokens") {
    val df = Seq((1L, "ab 12 c!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").head()
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("re_tokens") == 4L) // [ab][12][c][!]
    assert(r.getAs[Double]("chars_per_token") == 2.0)
  }

  test("chunk: overlapping word windows cover the document exactly") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), (2L, "short")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
    val doc1 = out.filter(_.getLong(0) == 1L).map(r => r.getString(2))
    // stride 3: [w1..w4], [w4..w7], [w7..w10] — boundaries shared once
    assert(doc1.toSeq == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // a doc shorter than one chunk yields itself, once
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1 && doc2(0).getString(2) == "short"
      && doc2(0).getLong(3) == 1L)
  }

  test("normalize: lowercases, redacts urls/emails, collapses digits and spaces") {
    val df = Seq((1L, "See https://x.co/a and Mail Bob@Ex.COM:  pay 1250 now"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df, "text").head().getString(1)
    assert(out == "see <url> and mail <email>: pay 0 now", s"got '$out'")
    assert(TextAnalysis.normalize(df, "text").columns.toSeq == Seq("doc_id", "text"))
  }

  test("fingerprint: content identity, order sensitivity") {
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, "ba")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == 97L * 31 + 98) // ((0*31+97)*31+98) mod P
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("language id picks max marker overlap with alphabetical tie-break") {
    val df = Seq(
      (1L, "der die the cat", "de"),   // de=2 > en=1
      (2L, "the cat of hats", "en"),   // en
      (3L, "xyz qqq www", "zh")        // no markers -> und
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(df, "doc_id", "text", "lang")
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    assert(out(1L) == "de" && out(2L) == "en" && out(3L) == "und")
  }

  test("language distribution aggregates per declared language") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = TextAnalysis.langDist(docs, "lang", "text")
    assert(out.count() == 5)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0) == 500L)
  }

  test("repetition counts duplicate and top bigram fractions") {
    val df = Seq(
      (1L, "a b a b c"),   // bigrams: ab, ba, ab, bc -> 4 total, 3 distinct
      (2L, "x y"),         // one bigram
      (3L, "solo")         // shorter than a bigram -> no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Long]("n_ngrams") == 4L)
    assert(out(1L).getAs[Long]("n_distinct_ngrams") == 3L)
    assert(out(1L).getAs[Double]("dup_ngram_frac") == 0.25)  // (4-3)/4
    assert(out(1L).getAs[Double]("top_ngram_frac") == 0.5)   // "a b" 2/4
    assert(out(2L).getAs[Long]("n_ngrams") == 1L)
    assert(out(2L).getAs[Double]("dup_ngram_frac") == 0.0)
  }

  test("quality score: logistic over named metrics, keep at threshold") {
    val df = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    // ttr = 1.0, stopword_ratio = 0.333333, punct_ratio = 0
    // linear = -1 + 2*1 + 3*0.333333 = 1.999999 -> sigmoid ~ 0.880797
    val r = TextAnalysis.qualityScore(df, "doc_id", "text",
      Seq("ttr" -> 2.0, "stopword_ratio" -> 3.0), bias = -1.0).head()
    assert(math.abs(r.getAs[Double]("score") - 0.880797) < 1e-6)
    assert(r.getAs[Boolean]("keep"))
    // unknown metric name is rejected loudly, not silently scored as 0
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityScore(df, "doc_id", "text", Seq("nope" -> 1.0))
    }
  }

  test("hashing vectorizer: exact bucket counts, zero-filled, feeds similarity") {
    val df = Seq((1L, "x x y"), (2L, "x x y"), (3L, "q r s t u v")).toDF("doc_id", "text")
    val out = TextAnalysis.hashingVectorize(df, "doc_id", "text", dim = 8)
    val vecs = out.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(1L).sum == 3.0 && vecs(1L).length == 8) // 3 words counted
    assert(vecs(1L) == vecs(2L), "equal texts vectorize equally")
    // composition: the count vectors drive embedding near-dup directly
    val pairs = Similarity.nearDupPairs(
      out.select($"doc_id".as("vec_id"),
        $"vec".cast("array<float>").as("embedding")),
      threshold = 0.99)
    assert(pairs.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      == Set((1L, 2L)))
  }

  test("ngram counts: corpus-wide with the minCount vocabulary prune") {
    val df = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(df, "text", n = 2, minCount = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b", 2L))) // "b c"/"b d" pruned at minCount 2
  }

  test("heavy hitters: exact counts, deterministic cut, no global sort") {
    val df = Seq((1L, "a b a"), (2L, "b a c")).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(df, "text", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 3L), ("b", 2L)))
    val plan = TextAnalysis.heavyHitters(df, "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  test("tfidf ranks rarer terms above corpus-wide ones, ties by term") {
    // "cat" appears in 1 of 3 docs; "the" in all 3: same tf in doc 1, but
    // idf must rank "cat" first
    val df = Seq(
      (1L, "the cat the cat"),
      (2L, "the dog"),
      (3L, "the bird")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(df, "doc_id", "text", k = 2)
      .where($"doc_id" === 1L).orderBy("rnk")
      .select("term").as[String].collect().toSeq
    assert(out == Seq("cat", "the"))
    // determinism: equal score -> term order
    val tie = TextAnalysis.tfidfTopK(
      Seq((1L, "b a")).toDF("doc_id", "text"), "doc_id", "text", k = 2)
      .orderBy("rnk").select("term").as[String].collect().toSeq
    assert(tie == Seq("a", "b"))
  }

  test("dupSpans: shared spans counted, unique docs zero, short-doc fallback") {
    val df = Seq(
      (0L, "a b c d e"),  // 3-grams: abc bcd cde
      (1L, "a b c x y"),  // shares abc with doc 0
      (2L, "p q r s t"),  // all unique
      (3L, "xy"),         // short: whole-text fallback gram
      (4L, "xy")          // exact dup of 3 -> both fully duplicated
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((3L, 1L, 0.333333)))
    assert(out(1L) == ((3L, 1L, 0.333333)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((1L, 1L, 1.0)) && out(4L) == ((1L, 1L, 1.0)))
    graft.util.Caches.unpersistAll()
  }

  test("dupRuns: contiguous islands measured, scattered dups don't chain, " +
      "within-doc repeats don't count as cross-doc") {
    val df = Seq(
      // docs 0/1 share the 4-word block "c1 c2 c3 c4" (two 3-gram
      // positions) AND the lone gram "s1 s2 s3" far apart -> max_run 2
      (0L, "a b c1 c2 c3 c4 d e f s1 s2 s3 g h"),
      (1L, "x y c1 c2 c3 c4 z w v s1 s2 s3 u t"),
      // doc 2: nothing shared
      (2L, "p q r s t u v"),
      // doc 3: internal repeat only — repeats within ONE doc are not
      // cross-doc duplication (df counts distinct docs)
      (3L, "m1 m2 m3 m1 m2 m3 m1 m2 m3")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupRuns(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 0: 12 grams; dup = 2 (c-block) + 1 (s-gram) = 3; islands 2 and 1
    assert(out(0L) == ((12L, 3L, 2L)), s"got ${out(0L)}")
    assert(out(1L) == ((12L, 3L, 2L)), s"got ${out(1L)}")
    assert(out(2L) == ((5L, 0L, 0L)), s"got ${out(2L)}")
    assert(out(3L) == ((7L, 0L, 0L)), s"got ${out(3L)}")
    graft.util.Caches.unpersistAll()
  }

  test("dupRuns: full-doc duplicates are one doc-length island; short-doc " +
      "fallback gram") {
    val df = Seq(
      (0L, "w1 w2 w3 w4 w5 w6"),
      (1L, "w1 w2 w3 w4 w5 w6"), // exact dup: every position duplicated
      (2L, "zz")                 // short: whole-text fallback, unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupRuns(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((4L, 4L, 4L)))
    assert(out(1L) == ((4L, 4L, 4L)))
    assert(out(2L) == ((1L, 0L, 0L)))
    graft.util.Caches.unpersistAll()
  }

  test("dupSubstring: exact longest shared substring per pair, diagonal " +
      "alignment, df-cap guard, sub-n docs out of contract") {
    val df = Seq(
      // docs 0/1 share "c1 c2 c3 c4 c5" (5 words) and separately
      // "s1 s2 s3" (3 words): longest = 5, i.e. max_run 3 at n=3
      (0L, "a b c1 c2 c3 c4 c5 d e s1 s2 s3 f g"),
      (1L, "x c1 c2 c3 c4 c5 y z w s1 s2 s3 q"),
      // doc 2 shares only the 3-word "s1 s2 s3" with both 0 and 1
      (2L, "n1 n2 s1 s2 s3 n3 n4 n5"),
      // doc 3: 4 words < would-be threshold interplay; shares 3-word
      // block with nobody; no row
      (3L, "p q r s t u v"),
      // doc 4: shorter than n words — out of contract even though its
      // whole text appears inside doc 0
      (4L, "c1 c2")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSubstring(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // run of 3 aligned 3-gram matches = 5 shared words
    assert(out((0L, 1L)) == ((3L, 5L)), s"got ${out.get((0L, 1L))}")
    assert(out((0L, 2L)) == ((1L, 3L)))
    assert(out((1L, 2L)) == ((1L, 3L)))
    assert(!out.contains((0L, 3L)) && !out.contains((0L, 4L)),
      s"unexpected pairs: ${out.keys}")
    assert(out.size == 3)
    graft.util.Caches.unpersistAll()
    // df-cap: the s-gram appears in 3 docs; maxDf=2 drops it, so the
    // only surviving pair is the c-block one
    val capped = TextAnalysis.dupSubstring(df, "doc_id", "text", n = 3,
        maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L)), s"got $capped")
    graft.util.Caches.unpersistAll()
  }

  test("dupSubstring: scattered shared grams do not chain into a run") {
    val df = Seq(
      (0L, "k1 k2 k3 a a a k4 k5 k6 b b b"),
      (1L, "k1 k2 k3 c c c k4 k5 k6 d d d")
    ).toDF("doc_id", "text")
    // both 3-blocks align at the SAME diagonal (offset 0) but positions
    // 1 and 7 are not consecutive -> two runs of 1, never a run of 2
    val out = TextAnalysis.dupSubstring(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 3L)), s"got $out")
    graft.util.Caches.unpersistAll()
  }

  test("dupSubstringApply: excises the shared span from the higher-id " +
      "doc only; full copies empty; sub-n docs untouched") {
    val df = Seq(
      (0L, "a b c1 c2 c3 c4 c5 d e"),          // keeper of the c-block
      (1L, "x y c1 c2 c3 c4 c5 z w"),          // loses exactly c1..c5
      (2L, "a b c1 c2 c3 c4 c5 d e"),          // exact copy of 0 -> ''
      (3L, "p q r s t u v w x"),               // nothing shared
      (4L, "c1 c2")                            // sub-n: untouched
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSubstringApply(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == (("a b c1 c2 c3 c4 c5 d e", 9L, 0L)),
      "the first occurrence must survive whole")
    assert(out(1L) == (("x y z w", 9L, 5L)), s"got ${out(1L)}")
    assert(out(2L) == (("", 9L, 9L)), "an exact copy loses everything")
    assert(out(3L) == (("p q r s t u v w x", 9L, 0L)))
    assert(out(4L) == (("c1 c2", 2L, 0L)), "sub-n docs out of contract")
    graft.util.Caches.unpersistAll()
  }

  test("dupSubstringApply: minRun raises the excision threshold and " +
      "layout does not change the output") {
    val df = Seq(
      (0L, "k1 k2 k3 m1 m2 q1 q2 q3 q4 q5"),
      // shares the 3-word k-block (1 run) and the 5-word q-block (3
      // runs at n=3): minRun=2 excises only the q-block
      (1L, "k1 k2 k3 n1 n2 q1 q2 q3 q4 q5")
    ).toDF("doc_id", "text")
    val strict = TextAnalysis.dupSubstringApply(df, "doc_id", "text",
        n = 3, minRun = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict(1L) == "k1 k2 k3 n1 n2", s"got ${strict(1L)}")
    graft.util.Caches.unpersistAll()
    val base = TextAnalysis.dupSubstringApply(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val again = TextAnalysis.dupSubstringApply(df.repartition(5),
        "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(again == base)
    graft.util.Caches.unpersistAll()
  }

  test("selfRepetitionApply: later occurrences excise, first survives; " +
      "periodic text collapses to one period; occ cap is conservative") {
    val df = Seq(
      // the 4-word block "r1 r2 r3 r4" repeats later -> second copy goes
      (0L, "a r1 r2 r3 r4 b c r1 r2 r3 r4 d"),
      // pure period: "x y z" * 4 -> one period survives
      (1L, "x y z x y z x y z x y z"),
      // no internal repeats
      (2L, "p q r s t u v"),
      // degenerate repetition beyond the occ cap: conservative (kept)
      (3L, Seq.fill(80)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.selfRepetitionApply(df, "doc_id", "text",
        n = 3, maxOcc = 64)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == (("a r1 r2 r3 r4 b c d", 12L, 4L)), s"${out(0L)}")
    assert(out(1L) == (("x y z", 12L, 9L)), s"${out(1L)}")
    assert(out(2L) == (("p q r s t u v", 7L, 0L)))
    assert(out(3L)._3 == 0L,
      "grams over the occ cap must be left alone (conservative)")
    graft.util.Caches.unpersistAll()
    val again = TextAnalysis.selfRepetitionApply(df.repartition(5),
        "doc_id", "text", n = 3, maxOcc = 64)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val base = TextAnalysis.selfRepetitionApply(df, "doc_id", "text",
        n = 3, maxOcc = 64)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(again == base)
    graft.util.Caches.unpersistAll()
  }

  test("keyness surfaces each group's distinctive term with positive z") {
    val df = Seq(
      ("a", "foo foo foo common words here"),
      ("a", "foo foo common words again"),
      ("b", "bar bar bar common words here"),
      ("b", "bar bar common words again")
    ).toDF("lang", "text")
    val out = TextAnalysis.keyness(df, "lang", "text", topK = 2)
    val top = out.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy($"z".desc, $"word")))
      .where($"rnk" === 1)
      .select("grp", "word", "z").as[(String, String, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(top("a")._1 == "foo" && top("a")._2 > 0, s"group a: $top")
    assert(top("b")._1 == "bar" && top("b")._2 > 0, s"group b: $top")
    // topK bounds output per group
    assert(out.groupBy("grp").count().select("count").as[Long]
      .collect().forall(_ <= 2))
    graft.util.Caches.unpersistAll()
  }

  test("headCoverage: cumulative Zipf head share, total tie order") {
    val df = Seq((1L, "a a a b b c"), (2L, "a b z")).toDF("doc_id", "text")
    val out = TextAnalysis.headCoverage(df, "text", k = 3)
      .as[(Long, String, Long, Long, Long, Double)].collect()
    // cf: a=4, b=3, c=1, z=1 (ties break on term); total = 9
    assert(out.toSeq == Seq(
      (1L, "a", 4L, 4L, 9L, 4.0 / 9),
      (2L, "b", 3L, 7L, 9L, 7.0 / 9),
      (3L, "c", 1L, 8L, 9L, 8.0 / 9)))
  }

  test("charEntropy: 0 for constant text, ln(k) for uniform k symbols") {
    val df = Seq(
      (1L, "aaaa"),  // one symbol: entropy 0
      (2L, "ab"),    // uniform 2: ln 2
      (3L, "abab"),  // same distribution as doc 2: same entropy
      (4L, "abcd"),  // uniform 4: ln 4
      (5L, "aab")    // 2/3, 1/3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == 0.693147) // round(ln 2, 6dp) under the micro-nat contract
    assert(out(3L) == out(2L))
    assert(out(4L) == 1.386294)
    assert(out(5L) == 0.636514) // -(2/3·ln(2/3) + 1/3·ln(1/3))
  }

  test("pmiCollocations: collocated pair scores high, independent pair ~0") {
    // "new york" always adjacent (collocation); "the" pairs freely
    val df = Seq(
      (1L, "new york is big"), (2L, "new york is old"),
      (3L, "the cat sat"), (4L, "the dog ran"), (5L, "the cat ran")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(df, "text", minPair = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val (cNY, pmiNY) = out(("new", "york"))
    assert(cNY == 2)
    // exact expectation: N = 17 tokens, Np = 12 bigrams:
    // ln(c_xy·N²/(Np·c_x·c_y)) = ln(2·17²/(12·2·2))
    assert(pmiNY == BigDecimal(math.log(2.0 * 17 * 17 / (12.0 * 2 * 2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // "the cat" (2 of 3 "the" bigrams) scores well below the collocation
    assert(out(("the", "cat"))._2 < pmiNY)
    graft.util.Caches.unpersistAll()
  }

  test("bpePairCounts: word-frequency-weighted adjacent char pairs") {
    val df = Seq((1L, "ab ab cd"), (2L, "abc x")).toDF("doc_id", "text")
    // vocab: ab×2, cd×1, abc×1 ("x" is sub-2-char: no pairs)
    // pairs: "ab" from ab(2) + abc(1) = 3; "bc" from abc = 1; "cd" = 1
    val all = TextAnalysis.bpePairCounts(df, "text", minCount = 1)
      .as[(String, Long)].collect().toMap
    assert(all == Map("ab" -> 3L, "bc" -> 1L, "cd" -> 1L))
    // the minCount prune drops everything a merge could never pick
    val pruned = TextAnalysis.bpePairCounts(df, "text", minCount = 2)
      .as[(String, Long)].collect().toMap
    assert(pruned == Map("ab" -> 3L))
  }

  test("blocklist: whole-word hits only, clean docs absent, sorted terms") {
    val df = Seq(
      (1L, "the bad word bad again"),   // bad x2
      (2L, "badge is not bad-ness"),    // substrings must NOT match
      (3L, "ugly and bad together")     // two distinct terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklist(df, "doc_id", "text",
        Seq("bad", "ugly"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, "bad"),
      (3L, 2L, 2L, "bad,ugly")))      // doc 2 is clean: absent
  }

  test("blocklist rejects empty and multi-word terms") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklist(df, "doc_id", "text", Seq("two words"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklist(df, "doc_id", "text", Seq.empty)
    }
  }

  test("bpeLearnMerges: hand-computed merges, left-to-right scan, early stop") {
    // wc: "aaab" x2, "ab" x1
    val df = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeLearnMerges(df, "text", rounds = 4)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // r1: (a,a)=4 beats (a,b)=3; aaab -> [aa,a,b] (left-to-right, no
    //     overlap chain) ; r2: (a,b)=3 ; r3: (aa,ab)=2 ; r4: no pairs
    assert(out.toSeq == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L)))
  }

  test("bpeLearnMerges: count ties resolve to the smallest (left, right)") {
    val df = Seq((1L, "zw xy")).toDF("doc_id", "text")
    val first = TextAnalysis.bpeLearnMerges(df, "text", rounds = 1)
      .collect().head
    assert((first.getString(1), first.getString(2)) == (("x", "y")))
  }

  test("bpeLearnMerges is layout-independent") {
    val rows = (1L to 60L).map(i =>
      (i, Seq.fill((i % 5 + 1).toInt)(s"w${i % 11}x").mkString(" ")))
    val df1 = rows.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeLearnMerges(d, "text", rounds = 3)
        .orderBy("merge_round").collect().toSeq
    assert(run(df1) == run(df1.repartition(7)))
  }

  test("langPurity: unanimous doc scores 1.0, code-switched doc splits") {
    val en = Seq.fill(16)("the").mkString(" ")
    val de = Seq.fill(16)("der").mkString(" ")
    val df = Seq(
      (1L, s"$en $en"),        // 2 chunks, both en
      (2L, s"$en $de"),        // en chunk + de chunk
      (3L, "xyz qqq")          // 1 chunk, no markers -> und
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langPurity(df, "doc_id", "text", chunkSize = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 2L, 0.5)))
    assert(out(3L) == ((1L, 1L, 1.0)))
  }

  test("heavyHittersGrouped: per-group top-k, tie to smaller term") {
    val df = Seq(("en", "a a b c"), ("en", "b a"), ("de", "x y y"))
      .toDF("lang", "text")
    val out = TextAnalysis.heavyHittersGrouped(df, "lang", "text", k = 2)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(("en", "a", 3L, 1L), ("en", "b", 2L, 2L),
      ("de", "y", 2L, 1L), ("de", "x", 1L, 2L)), s"got $out")
  }

  test("bpeApplyMerges: hand-computed token counts under chained merges") {
    val df = Seq((1L, "the then an and"), (2L, "xyz"), (3L, "a an"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeApplyMerges(df, "doc_id", "text",
      Seq("t" -> "h", "th" -> "e", "a" -> "n", "an" -> "d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: "the"->[the] 1, "then"->[the,n] 2, "an"->[an] 1,
    //        "and"->[and] 1  => 5 tokens
    assert(out(1L) == 5L)
    // doc 2: no merge applies -> 3 single-char tokens
    assert(out(2L) == 3L)
    // doc 3: "a" stays 1, "an" merges to 1 -> 2
    assert(out(3L) == 2L)
  }

  test("bpeApplyMerges: merges never cross a word boundary") {
    // "t h" would merge only if the space were transparent
    val df = Seq((1L, "t h")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeApplyMerges(df, "doc_id", "text",
      Seq("t" -> "h")).collect()
    assert(out(0).getLong(1) == 2L)
  }

  test("bpeFertility: exact token/word sums per group") {
    val df = Seq(
      ("en", "the then"), // 1 + 2 tokens, 2 words
      ("en", "an and"),   // 1 + 1 tokens (a+n, then an+d), 2 words
      ("de", "xyz")       // 3 tokens, 1 word
    ).toDF("lang", "text")
    val out = TextAnalysis.bpeFertility(df, "text", "lang",
      Seq("t" -> "h", "th" -> "e", "a" -> "n", "an" -> "d"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("en") == ((2L, 4L, 5L, 1.25)))
    assert(out("de") == ((1L, 1L, 3L, 3.0)))
  }

  test("bpeApplyMerges: fingerprint separates encodings, narrow plan") {
    val df = Seq((1L, "th"), (2L, "t h"), (3L, "th")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeApplyMerges(df, "doc_id", "text",
      Seq("t" -> "h"))
    val fps = enc.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps(1L) == fps(3L), "identical text, identical fingerprint")
    assert(fps(1L) != fps(2L), "different tokenization, different fp")
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must stay narrow:\n$plan")
  }

  test("boilerplateChunks removes cross-doc chunks everywhere, keeps rare") {
    val df = Seq(
      (1L, "a b u v"),  // "a b" shared -> removed; "u v" kept
      (2L, "a b w z"),
      (3L, "q r q r"),  // within-doc repeat only: ONE distinct doc -> kept
      (4L, "a b")       // fully boilerplate -> empty clean_text
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateChunks(df, "doc_id", "text",
        window = 2, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "u v")))
    assert(out(2L) == ((2L, 1L, "w z")))
    assert(out(3L) == ((2L, 2L, "q r q r")))
    assert(out(4L) == ((1L, 0L, "")))
  }

  test("boilerplateChunks preserves segment order on reassembly") {
    val df = Seq(
      (1L, "x x k1 k1 x x k2 k2 x x"), // shared "x x" interleaved
      (2L, "x x")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateChunks(df, "doc_id", "text",
        window = 2, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getString(3) == "k1 k1 k2 k2")
    assert(out(1).getString(3) == "")
  }

  test("lexicalDiversity: hand-computed TTR and hapax ratios") {
    val df = Seq(
      (1L, "a b a b a"),   // 5 tokens, 2 types, 0 hapax
      (2L, "x y z"),       // 3 tokens, 3 types, 3 hapax
      (3L, "w w  q"),      // double space: 3 tokens, 2 types, 1 hapax
      (4L, "")             // token-less: zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 5L, 2L, 0.4, 0.0),
      (2L, 3L, 3L, 1.0, 1.0),
      (3L, 3L, 2L, 0.666667, 0.333333),
      (4L, 0L, 0L, 0.0, 0.0)))
  }

  test("chao1: hand-computed estimate, f2=0 well-defined, empty corpus") {
    // counts: a:3, b:2, c:1, d:1 -> D=4, f1=2, f2=1, n=7
    // chao1 = 4 + 2*1/(2*2) = 4.5
    val df = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val r = TextAnalysis.chao1(df, "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((7L, 4L, 2L, 1L, 4.5)))
    // no doubletons: bias-corrected denominator keeps it finite
    // counts: a:1, b:1 -> chao1 = 2 + 2*1/2 = 3.0
    val r2 = TextAnalysis.chao1(Seq((1L, "a b")).toDF("doc_id", "text"),
      "text").collect().head
    assert(r2.getDouble(4) == 3.0)
    // all tokens seen twice+: estimate equals the observed type count
    val r3 = TextAnalysis.chao1(Seq((1L, "a a b b")).toDF("doc_id", "text"),
      "text").collect().head
    assert(r3.getLong(1) == 2L && r3.getDouble(4) == 2.0)
    // empty corpus: zero row, not an empty result
    val r4 = TextAnalysis.chao1(Seq((1L, "")).toDF("doc_id", "text"),
      "text").collect().head
    assert((r4.getLong(0), r4.getLong(1), r4.getDouble(4)) == ((0L, 0L, 0.0)))
  }

  test("readability: hand-computed Flesch, vowel-less floor, empty doc") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "tsk brr"),
      (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 6 one-vowel-group words, 2 sentence runs
    // flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ==
      ((6L, 2L, 6L)))
    assert(r(0).getDouble(4) == 3.0 && r(0).getDouble(5) == 1.0)
    assert(math.abs(r(0).getDouble(6) - 119.19) < 1e-9)
    // vowel-less words still carry one syllable; no terminator -> 1
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) ==
      ((2L, 1L, 2L)))
    assert(math.abs(r(1).getDouble(6) - (206.835 - 1.015 * 2 - 84.6)) < 1e-9)
    // empty doc keeps its row with zero signals
    assert((r(2).getLong(1), r(2).getLong(3), r(2).getDouble(6)) ==
      ((0L, 0L, 0.0)))
  }

  test("zipfFit: exact two-point fit, topN truncation, flat corpus") {
    // counts: a x8, b x4, c x2 -> with topN=2 the fit is the exact line
    // through (ln1, ln8), (ln2, ln4): slope -1, intercept ln 8
    val df = Seq((1L, "a a a a a a a a b b b b c c")).toDF("doc_id", "text")
    val two = TextAnalysis.zipfFit(df, "text", topN = 2).collect().head
    assert(two.getLong(0) == 2L)
    assert(math.abs(two.getDouble(1) - (-1.0)) < 1e-5)
    assert(math.abs(two.getDouble(2) - math.log(8)) < 1e-5)
    // full vocabulary: least squares over (ln r, ln c), checked against a
    // plain-Scala reference with the same fixed-point quantization
    val all = TextAnalysis.zipfFit(df, "text", topN = 10).collect().head
    val pts = Seq((1.0, 8.0), (2.0, 4.0), (3.0, 2.0))
      .map { case (rk, c) => (math.log(rk), math.log(c)) }
    val n = pts.size.toDouble
    val q = (v: Double) => math.round(v * 1048576).toDouble / 1048576
    val (sx, sy) = (pts.map(p => q(p._1)).sum, pts.map(p => q(p._2)).sum)
    val sxx = pts.map(p => q(p._1 * p._1)).sum
    val sxy = pts.map(p => q(p._1 * p._2)).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(all.getLong(0) == 3L)
    assert(math.abs(all.getDouble(1) - slope) < 1e-5)
    // uniform counts: zero rank-variance explained, slope 0 by fit
    val flat = TextAnalysis.zipfFit(
      Seq((1L, "x y z")).toDF("doc_id", "text"), "text").collect().head
    assert(flat.getLong(0) == 3L && flat.getDouble(1) == 0.0)
  }

  test("heavyChangers: hand-computed share deltas, both directions") {
    // A: x x y (shares x=2/3, y=1/3); B: x z z (x=1/3, z=2/3)
    val a = Seq((1L, "x x y")).toDF("id", "text")
    val b = Seq((2L, "x z z")).toDF("id", "text")
    val all = TextAnalysis.heavyChangers(a, b, "text", k = 3).collect()
    assert(all.length == 3)
    // |delta|: z 2/3, then the x/y tie at 1/3 breaks x before y
    assert(all.map(_.getAs[String]("term")).toSeq == Seq("z", "x", "y"))
    val z = all.head
    assert(z.getAs[Long]("n_a") == 0L && z.getAs[Long]("n_b") == 2L)
    assert(z.getAs[Double]("share_a") == 0.0)
    assert(z.getAs[Double]("share_b") == 0.666667)
    assert(z.getAs[Double]("delta") == 0.666667)
    val x = all(1)
    assert(x.getAs[Double]("delta") == -0.333333)
    // the top-k cut respects the same ordering
    val top1 = TextAnalysis.heavyChangers(a, b, "text", k = 1).collect()
    assert(top1.map(_.getAs[String]("term")).toSeq == Seq("z"))
  }

  test("heavyChangers: case folding and empty-token filtering") {
    val a = Seq((1L, "Foo  foo")).toDF("id", "text") // double space
    val b = Seq((2L, "FOO bar")).toDF("id", "text")
    val r = TextAnalysis.heavyChangers(a, b, "text", k = 10)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))).toMap
    assert(r("foo") == ((2L, 1L)), "cases fold together, empties dropped")
    assert(r("bar") == ((0L, 1L)))
  }

  test("heavyChangers result is independent of input partitioning") {
    val docs = spark.range(0, 400).select(col("id"),
      concat(lit("w"), (col("id") % 23).cast("string"), lit(" common x y "),
        lit("w"), (col("id") % 7).cast("string")).as("text"))
    val a = docs.where(col("id") % 2 === 0)
    val b = docs.where(col("id") % 2 === 1)
    val base = TextAnalysis.heavyChangers(a, b, "text", k = 15).collect()
    val again = TextAnalysis
      .heavyChangers(a.repartition(11), b.repartition(7), "text", k = 15)
      .collect()
    assert(again.map(_.toString).toSeq == base.map(_.toString).toSeq)
  }

  test("charClassMix: hand-counted classes, empty doc, row preservation") {
    val df = Seq((1L, "Ab1 !\né"), (2L, ""), (3L, "\t123"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charClassMix(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3, "one row per input doc")
    val r1 = out(0)
    // A b 1 ' ' ! \n é -> 7 chars: 2 letters, 1 digit, 2 ws, 1 non-ascii,
    // 1 other (the !)
    assert(r1.getAs[Long]("n_chars") == 7L)
    assert(r1.getAs[Long]("n_letters") == 2L)
    assert(r1.getAs[Long]("n_digits") == 1L)
    assert(r1.getAs[Long]("n_ws") == 2L)
    assert(r1.getAs[Long]("n_non_ascii") == 1L)
    assert(r1.getAs[Long]("n_other") == 1L)
    assert(r1.getAs[Double]("letter_ratio") == 0.285714)
    assert(r1.getAs[Double]("non_ascii_ratio") == 0.142857)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_chars") == 0L)
    assert(r2.getAs[Double]("letter_ratio") == 0.0, "empty doc: zeros")
    val r3 = out(2)
    assert(r3.getAs[Long]("n_ws") == 1L, "tab counts as whitespace")
    assert(r3.getAs[Double]("digit_ratio") == 0.75)
  }

  test("distinctN: hand-computed diversity; template spam collapses " +
      "distinct-2 while staying per-doc clean; sub-n docs contribute " +
      "no grams") {
    val docs = Seq(
      (1L, "en", "a b c"),
      (2L, "en", "a b d"),
      (3L, "en", "x")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.distinctN(docs, "text", "lang")
      .orderBy("n").collect()
    // n=1: grams a b c a b d x -> 7 total, 5 distinct
    assert(out(0).getAs[Long]("n_grams") == 7L
      && out(0).getAs[Long]("n_distinct") == 5L)
    assert(out(0).getAs[Double]("distinct_ratio") == 0.714286)
    // n=2: "a b","b c","a b","b d" -> 4 total, 3 distinct (doc 3 too
    // short: contributes nothing, no whole-text fallback)
    assert(out(1).getAs[Long]("n_grams") == 4L
      && out(1).getAs[Long]("n_distinct") == 3L)
    // n=3: one gram per 3-word doc -> 2 total, 2 distinct
    assert(out(2).getAs[Long]("n_grams") == 2L
      && out(2).getAs[Long]("n_distinct") == 2L)
    // a million-template source: every doc distinct, the corpus is not
    val spam = (1 to 50)
      .map(i => (i.toLong, "en", s"click here now offer $i"))
      .toDF("doc_id", "lang", "text")
    val d2 = TextAnalysis.distinctN(spam, "text", "lang", Seq(2))
      .collect().head
    assert(d2.getAs[Double]("distinct_ratio") < 0.3,
      s"template spam must collapse distinct-2, got $d2")
    graft.util.Caches.unpersistAll()
  }

  test("scriptMix: pinned per-script counts on a hand string; shares " +
      "sum to 1; empty doc reads all-zero shares") {
    // "Hello Мир 中文 123 ::" — latin 5, cyrillic 3, cjk 2, digit 3,
    // ws 4, other 2 (the colons), total 19
    val df = Seq((1L, "Hello Мир 中文 123 ::"), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r = out.head
    assert(r.getAs[Long]("n_chars") == 19L)
    assert(r.getAs[Long]("n_latin") == 5L)
    assert(r.getAs[Long]("n_cyrillic") == 3L)
    assert(r.getAs[Long]("n_cjk") == 2L)
    assert(r.getAs[Long]("n_digit") == 3L)
    assert(r.getAs[Long]("n_ws") == 4L)
    assert(r.getAs[Long]("n_other") == 2L)
    assert(r.getAs[Long]("n_hangul") == 0L)
    val shareCols = TextAnalysis.ScriptClasses.map(c => s"share_${c._1}")
    // script shares + ws + other cover everything: counts partition len
    val covered = shareCols.map(r.getAs[Double]).sum +
      r.getAs[Double]("share_other") + 4.0 / 19.0
    assert(math.abs(covered - 1.0) < 1e-6)
    assert(r.getAs[Double]("share_cyrillic") == 0.157895) // round6(3/19)
    // empty doc: zero counts, pinned 0.0 shares (no NULL, no NaN)
    val e = out.last
    assert(e.getAs[Long]("n_chars") == 0L)
    assert(shareCols.forall(c => e.getAs[Double](c) == 0.0))
    assert(e.getAs[Double]("share_other") == 0.0)
  }

  test("heapsLaw: hand-computed growth curve; all-new-words corpus " +
      "fits beta = 1 / log_k = 0 exactly; layout bit-invariant") {
    val docs = Seq((0L, "a b"), (1L, "a c c"), (2L, "d"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.heapsLaw(docs, "doc_id", "text",
        checkpoints = 3).orderBy("ckpt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bounds at ids 1, 2, 3: prefixes {doc0}, {doc0,1}, {all}
    assert(out == Seq((1L, 2L, 2L), (2L, 5L, 3L), (3L, 6L, 4L)), out)
    // a corpus of entirely new words: V(N) = N -> the log-log fit is
    // exactly the identity line
    val fresh = Seq((0L, "w1 w2"), (1L, "w3 w4 w5"), (2L, "w6"))
      .toDF("doc_id", "text")
    val f = TextAnalysis.heapsLaw(fresh, "doc_id", "text", 3)
      .collect().head
    assert(f.getAs[Double]("beta") == 1.0 &&
      f.getAs[Double]("log_k") == 0.0, f.toString)
    // one repeated word: V pinned at 1 -> slope 0
    val mono = Seq((0L, "x x"), (1L, "x"), (2L, "x x x"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.heapsLaw(mono, "doc_id", "text", 3)
      .collect().head
    assert(m.getAs[Double]("beta") == 0.0, m.toString)
    val rp = TextAnalysis.heapsLaw(docs.repartition(5), "doc_id", "text",
        checkpoints = 3).orderBy("ckpt").collect().map(_.toString).toSeq
    val base = TextAnalysis.heapsLaw(docs, "doc_id", "text",
        checkpoints = 3).orderBy("ckpt").collect().map(_.toString).toSeq
    assert(rp == base)
    intercept[IllegalArgumentException] {
      TextAnalysis.heapsLaw(docs, "doc_id", "text", 2)
    }
    graft.util.Caches.unpersistAll()
  }
}

package graft.ops

import scala.util.Random

/** Randomized (seeded) property pins for the round-18 operators: a
  * driver-side reference implementation of interpolated Kneser-Ney
  * trigram scoring (per-trigram probabilities AND the per-context
  * sum-to-one identity the smoothing must satisfy).
  */
class Round18PropertySpec extends graft.SparkSpec {
  import spark.implicits._

  /** Reference interpolated-KN trigram model over a token corpus: the
    * Chen-Goodman formulation with one fixed discount, continuation
    * counts at the lower orders. Probabilities for ARBITRARY (w1,w2,w3)
    * with an observed (w1,w2) context — including trigrams never seen —
    * so the distribution identity can be checked over the full
    * vocabulary.
    */
  private final class RefKn(docs: Seq[Seq[String]], d: Double) {
    val c123 = scala.collection.mutable.Map.empty[(String, String, String), Long]
    docs.foreach { ws =>
      ws.sliding(3).filter(_.size == 3).foreach { t =>
        val k = (t(0), t(1), t(2)); c123(k) = c123.getOrElse(k, 0L) + 1
      }
    }
    val types3 = c123.keySet
    val c12 = types3.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      k -> ts.toSeq.map(c123).sum }
    val n12 = types3.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      k -> ts.size.toLong }
    val t23 = types3.map(t => (t._2, t._3))
    val nDot23 = types3.groupBy(t => (t._2, t._3)).map { case (k, ts) =>
      k -> ts.size.toLong }
    val nMid2 = t23.groupBy(_._1).map { case (w2, ps) =>
      w2 -> ps.toSeq.map(nDot23).sum }
    val n2dot = t23.groupBy(_._1).map { case (w2, ps) => w2 -> ps.size.toLong }
    val nDot3 = t23.groupBy(_._2).map { case (w3, ps) => w3 -> ps.size.toLong }
    val nTot = t23.size.toLong
    val vocab = types3.flatMap(t => Seq(t._1, t._2, t._3))

    def pCont(w3: String): Double =
      nDot3.getOrElse(w3, 0L).toDouble / nTot.toDouble
    def pBi(w2: String, w3: String): Double = {
      val mid = nMid2(w2).toDouble
      math.max(nDot23.getOrElse((w2, w3), 0L).toDouble - d, 0.0) / mid +
        (d * n2dot(w2).toDouble) / mid * pCont(w3)
    }
    def p(w1: String, w2: String, w3: String): Double = {
      val ctx = c12((w1, w2)).toDouble
      math.max(c123.getOrElse((w1, w2, w3), 0L).toDouble - d, 0.0) / ctx +
        (d * n12((w1, w2)).toDouble) / ctx * pBi(w2, w3)
    }
    def xent(ws: Seq[String]): (Long, Double) = {
      val tris = ws.sliding(3).filter(_.size == 3).toSeq
      val s6 = tris.map(t =>
        math.round(math.log(p(t(0), t(1), t(2))) * 1e6)).sum
      (tris.size.toLong,
        BigDecimal(-s6.toDouble / 1e6 / tris.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }
  }

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[Seq[String]] =
    (0 until nDocs).map { _ =>
      (0 until 3 + rnd.nextInt(30)).map(_ => s"w${rnd.nextInt(12)}")
    }

  test("knTrigramCrossEntropy matches the driver reference on random " +
      "corpora (exact 6dp)") {
    val rnd = new Random(1811)
    (0 until 3).foreach { trial =>
      val corpus = randomCorpus(rnd, 25 + rnd.nextInt(25))
      val ref = new RefKn(corpus, 0.75)
      val df = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = LanguageModel.knTrigramCrossEntropy(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      corpus.zipWithIndex.foreach { case (ws, i) =>
        if (ws.size >= 3) {
          val (n, x) = ref.xent(ws)
          assert(got(i.toLong) == ((n, x)), s"trial $trial doc $i")
        } else assert(!got.contains(i.toLong), s"trial $trial short doc $i")
      }
      graft.util.Caches.unpersistAll()
    }
  }

  test("the reference KN distribution sums to 1 over the vocabulary for " +
      "every observed context (the smoothing mass-conservation identity)") {
    val rnd = new Random(1812)
    val corpus = randomCorpus(rnd, 30)
    Seq(0.3, 0.75, 1.0).foreach { d =>
      val ref = new RefKn(corpus, d)
      // trigram level: sum over w3 in vocab — the KN interpolation only
      // redistributes mass, it must not create or destroy any
      ref.c12.keys.take(20).foreach { case (w1, w2) =>
        val s = ref.vocab.toSeq.map(w3 => ref.p(w1, w2, w3)).sum
        assert(math.abs(s - 1.0) < 1e-9, s"d=$d ctx=($w1,$w2) sum=$s")
      }
      // bigram level too
      ref.nMid2.keys.take(20).foreach { w2 =>
        val s = ref.vocab.toSeq.map(w3 => ref.pBi(w2, w3)).sum
        assert(math.abs(s - 1.0) < 1e-9, s"d=$d bigram ctx=$w2 sum=$s")
      }
    }
  }

  test("tClosenessProfile matches a brute driver EMD on random data, " +
      "is 0 for a corpus-identical group, and stays in [0, 1]") {
    val rnd = new Random(1814)
    (0 until 3).foreach { trial =>
      val rows = (0 until 300 + rnd.nextInt(200)).map { _ =>
        (s"q${rnd.nextInt(4)}", rnd.nextInt(15).toDouble)
      }
      val df = rows.toDF("q", "s")
      val got = Pii.tClosenessProfile(df, Seq("q"), "s", t = 0.1)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        .toMap
      // brute: sorted corpus values, cumulative shares, x2^20 snap
      val values = rows.map(_._2).distinct.sorted
      val n = rows.size.toLong
      val m = values.size.toLong
      rows.groupBy(_._1).foreach { case (q, grp) =>
        val ng = grp.size.toLong
        var cg = 0L; var c = 0L; var fp = 0L
        values.dropRight(1).foreach { v =>
          cg += grp.count(_._2 == v)
          c += rows.count(_._2 == v)
          val raw = (BigInt(cg) * n - BigInt(c) * ng).abs
          fp += math.round(raw.toDouble / (ng.toDouble * n.toDouble)
            * (1L << 20))
        }
        val emd = BigDecimal(fp.toDouble / (1L << 20) / (m - 1).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        val (gn, nv, e, risk) = got(q)
        assert(gn == ng && nv == m, s"trial $trial group $q counts")
        assert(e == emd, s"trial $trial group $q emd: $e vs $emd")
        assert(e >= 0.0 && e <= 1.0, s"trial $trial group $q range")
        assert(risk == (e > 0.1), s"trial $trial group $q flag")
      }
      graft.util.Caches.unpersistAll()
    }
    // one group = the corpus: distribution identical, distance exactly 0
    val one = (0 until 50).map(i => ("only", (i % 7).toDouble))
      .toDF("q", "s")
    val r = Pii.tClosenessProfile(one, Seq("q"), "s", t = 0.1).collect()
    assert(r.length == 1 && r.head.getDouble(3) == 0.0 &&
      !r.head.getBoolean(4))
    graft.util.Caches.unpersistAll()
  }

  /** Brute Viterbi reference mirroring the kernel's documented tie rule
    * (min cost, then fewest tokens, then smallest previous position).
    */
  private def bruteSegment(w: String, costs: Map[String, Long],
      maxPieceLen: Int, unk: Long): (Long, Long, Seq[String]) = {
    val L = w.length
    val state = Array.fill(L + 1)(Long.MaxValue)
    val back = Array.fill(L + 1)(-1)
    state(0) = 0L
    for (i <- 1 to L; j <- math.max(0, i - maxPieceLen) until i
        if state(j) != Long.MaxValue) {
      val piece = w.substring(j, i)
      val pc = costs.get(piece)
        .orElse(if (i - j == 1) Some(unk) else None)
      pc.foreach { c =>
        val cand = state(j) + c * 1024L + 1L
        if (cand < state(i)) { state(i) = cand; back(i) = j }
      }
    }
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = L
    while (p > 0) { pieces += w.substring(back(p), p); p = back(p) }
    (state(L) % 1024L, state(L) / 1024L, pieces.reverse.toSeq)
  }

  test("unigram encode matches a brute Viterbi DP on random words and " +
      "vocabularies; learn's segmentation counts are consistent") {
    val rnd = new Random(1815)
    (0 until 3).foreach { trial =>
      val alphabet = "abcd"
      def randWord = (0 until 1 + rnd.nextInt(10))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val words = (0 until 40).map(_ => randWord).distinct
      // random vocab: some multi-char pieces + MOST (not all) singles,
      // so the UNK fallback path is exercised
      val vocab: Seq[(String, Double)] =
        (0 until 10).map(_ => words(rnd.nextInt(words.size))
            .take(1 + rnd.nextInt(3)))
          .distinct.map(p => p -> -(1.0 + rnd.nextInt(40) / 10.0)) ++
        Seq("a" -> -4.0, "b" -> -4.1, "c" -> -4.2) // 'd' is UNK-only
      val costs = Unigram.pinnedCosts(vocab)
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = Unigram.encode(df, "doc_id", "text", vocab, maxPieceLen = 4)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val (toks, c6, _) = bruteSegment(w, costs, 4, Unigram.UnkCost6)
        val nll = BigDecimal(c6.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(got(i.toLong) == ((1L, toks, nll)), s"trial $trial '$w'")
      }
      graft.util.Caches.unpersistAll()
    }
  }

  test("unigram learn: vocab is seed-derived, counts positive, logp " +
      "ordered; segmenting the corpus with the learned vocab reproduces " +
      "the learned counts (the hard-EM fixed-point readout)") {
    val rnd = new Random(1816)
    val corpus = (0 until 60).map { _ =>
      Seq("table", "scan", "join", "row", "batch")
        .filter(_ => rnd.nextBoolean()) :+ "query"
    }
    val df = corpus.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val out = Unigram.learn(df, "text", vocabSize = 16, maxPieceLen = 4,
      iters = 2, seedSize = 32).collect()
    assert(out.nonEmpty && out.length <= 16)
    // ranks ordered by (cnt desc, piece asc), counts positive
    val ranked = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(ranked.map(_._1).toSeq == (1L to ranked.length).toSeq)
    assert(ranked.sliding(2).forall {
      case Array((_, p1, c1), (_, p2, c2)) =>
        c1 > c2 || (c1 == c2 && p1 < p2)
      case _ => true
    })
    assert(ranked.forall(_._3 > 0))
    graft.util.Caches.unpersistAll()
  }

  test("unigram encode/fertility run from parsed config and match the " +
      "library") {
    implicit val ctx: graft.pipeline.PipelineContext =
      graft.pipeline.PipelineContext(spark)
    Seq((1L, "en", "table scan"), (2L, "en", "batch join join"),
      (3L, "de", "row row row"))
      .toDF("doc_id", "lang", "text")
      .createOrReplaceTempView("r18_uni_docs")
    val conf = """{"stages": [
      {"type": "TextAnalysisTransform", "name": "ue",
       "analysis": "unigram_encode",
       "inputView": "r18_uni_docs", "outputView": "r18_uni_enc",
       "vocab": {"ta": "-2.5", "ble": "-2.8", "row": "-2.0",
         "a": "-4.0", "b": "-4.0", "c": "-4.0", "e": "-4.0", "h": "-4.0",
         "i": "-4.0", "j": "-4.0", "l": "-4.0", "n": "-4.0", "o": "-4.0",
         "s": "-4.0", "t": "-4.0", "w": "-4.0"}},
      {"type": "TextAnalysisTransform", "name": "uf",
       "analysis": "unigram_fertility",
       "inputView": "r18_uni_docs", "outputView": "r18_uni_fert",
       "vocab": {"row": "-2.0", "a": "-4.0"}},
      {"type": "TextAnalysisTransform", "name": "ul",
       "analysis": "unigram_learn",
       "inputView": "r18_uni_docs", "outputView": "r18_uni_learn",
       "vocabSize": 8, "seedSize": 16, "iters": 1}
    ]}"""
    val Right(p) = graft.pipeline.Parser.parse(conf,
      Map.empty[String, graft.connect.Connector]): @unchecked
    graft.pipeline.Runner.run(p).get
    val docs = spark.table("r18_uni_docs")
    val vocabE: Seq[(String, Double)] = Seq("a", "b", "c", "e", "h", "i",
      "j", "l", "n", "o", "s", "t", "w").map(_ -> -4.0) ++
      Seq("ta" -> -2.5, "ble" -> -2.8, "row" -> -2.0)
    def same(view: String, want: org.apache.spark.sql.DataFrame): Unit =
      assert(spark.table(view).collect().map(_.toString).toSet ==
        want.collect().map(_.toString).toSet, view)
    same("r18_uni_enc", Unigram.encode(docs, "doc_id", "text", vocabE))
    same("r18_uni_fert", Unigram.fertility(docs, "text", "lang",
      Seq("row" -> -2.0, "a" -> -4.0)))
    same("r18_uni_learn", Unigram.learn(docs, "text", vocabSize = 8,
      iters = 1, seedSize = 16))
    graft.util.Caches.unpersistAll()
  }

  test("kn_score runs from parsed config and matches the library") {
    implicit val ctx: graft.pipeline.PipelineContext =
      graft.pipeline.PipelineContext(spark)
    val rnd = new Random(1813)
    val corpus = randomCorpus(rnd, 20)
    corpus.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text").createOrReplaceTempView("r18_kn_docs")
    val conf = """{"stages": [
      {"type": "TextAnalysisTransform", "name": "kn", "analysis": "kn_score",
       "inputView": "r18_kn_docs", "outputView": "r18_kn_out",
       "discount": 0.5}
    ]}"""
    val Right(p) = graft.pipeline.Parser.parse(conf,
      Map.empty[String, graft.connect.Connector]): @unchecked
    graft.pipeline.Runner.run(p).get
    val want = LanguageModel.knTrigramCrossEntropy(
      spark.table("r18_kn_docs"), "doc_id", "text", Nil, 0.5)
    assert(spark.table("r18_kn_out").collect().map(_.toString).toSet ==
      want.collect().map(_.toString).toSet)
    graft.util.Caches.unpersistAll()
  }
}

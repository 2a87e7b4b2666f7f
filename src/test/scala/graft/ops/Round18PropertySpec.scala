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

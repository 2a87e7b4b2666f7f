package graft.ops

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, tiny vocabulary; "cat" appears in 3 docs, "dog" in 2,
  // "emu" in 1, "zzz" nowhere.
  private def docs = Seq(
    (1L, "cat dog cat"),
    (2L, "cat dog"),
    (3L, "cat"),
    (4L, "emu emu emu")
  ).toDF("doc_id", "text")

  test("postings carry per-(term, doc) tf") {
    val p = Retrieval.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(p == Set(
      ("cat", 1L, 2L), ("cat", 2L, 1L), ("cat", 3L, 1L),
      ("dog", 1L, 1L), ("dog", 2L, 1L),
      ("emu", 4L, 3L)))
  }

  test("dictionary has df/cf and prunes below minDf") {
    val d = Retrieval.invertedIndex(docs, "doc_id", "text", minDf = 2)
      .select("term", "df", "cf")
      .as[(String, Long, Long)].collect().toSet
    assert(d == Set(("cat", 3L, 4L), ("dog", 2L, 2L)))
  }

  test("idf decreases with df") {
    val idf = Retrieval.invertedIndex(docs, "doc_id", "text")
      .select("term", "idf").as[(String, Double)].collect().toMap
    assert(idf("emu") > idf("dog"))
    assert(idf("dog") > idf("cat"))
  }

  test("bm25 length norm beats raw tf; exactly the matching docs rank") {
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 3)
      .select("rnk", "doc_id").as[(Long, Long)].collect().toSeq
    // With avgdl=2.25: doc 3 ("cat", dl=1) normalizes to 2.2/1.7 per idf,
    // beating doc 1's tf=2 at dl=3 (4.4/3.5); doc 2 trails (2.2/2.1).
    assert(top.map(_._2) == Seq(3L, 1L, 2L))
    assert(top.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("docs matching no query term never appear; k caps the output") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("cat", "dog"), k = 2).select("doc_id").as[Long].collect()
    assert(out.length == 2)
    assert(!out.contains(4L))
  }

  test("multi-term scores sum per-term fixed-point weights exactly") {
    val both = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("cat", "dog"), k = 4)
      .select("doc_id", "n_hit", "score_fp")
      .as[(Long, Long, Long)].collect()
      .map { case (d, h, s) => d -> ((h, s)) }.toMap
    val catOnly = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 4)
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    val dogOnly = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("dog"), k = 4)
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    // df of each term is identical in the joint and single-term runs
    // (both restricted postings), so weights must add up long-exactly.
    assert(both(2L)._1 == 2L)
    assert(both(2L)._2 == catOnly(2L) + dogOnly(2L))
    assert(both(3L)._1 == 1L)
    assert(both(3L)._2 == catOnly(3L))
  }

  test("bm25 plan: stats and df broadcast; top-k is TakeOrdered, no global sort") {
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
  }

  test("rrf fusion: consensus docs outrank single-list docs; contributions exact") {
    import spark.implicits._
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rnk")
    val sem = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq(lex, sem), k = 10)
      .select("rnk", "doc_id", "n_lists", "score_fp")
      .as[(Long, Long, Long, Long)].collect()
    def c(r: Long) = math.floor(1e6 / (60.0 + r)).toLong
    val byDoc = out.map(t => t._2 -> t).toMap
    // doc 20 (ranks 2+1) beats doc 10 (ranks 1+3): both 2-list docs
    assert(out.head._2 == 20L && byDoc(20L)._4 == c(2) + c(1))
    assert(byDoc(10L)._4 == c(1) + c(3) && byDoc(10L)._3 == 2L)
    // single-list docs trail every 2-list doc here
    assert(byDoc(30L)._4 == c(3) && byDoc(30L)._3 == 1L)
    assert(byDoc(40L)._4 == c(2))
    assert(out.map(_._1).toSeq == (1L to 4L))
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil) }
  }

  test("rankEval: known-value metrics at k=3") {
    import spark.implicits._
    // q1: relevant docs {1, 2, 9}; run retrieves 1 at rank 1, 2 at rank 3
    // q2: relevant {5}; run never retrieves it inside k
    val run = Seq(
      ("q1", 1L, 1L), ("q1", 7L, 2L), ("q1", 2L, 3L), ("q1", 9L, 4L),
      ("q2", 6L, 1L), ("q2", 7L, 2L), ("q2", 8L, 3L), ("q2", 5L, 4L)
    ).toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("q1", 1L), ("q1", 2L), ("q1", 9L), ("q2", 5L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.rankEval(run, qrels, k = 3).orderBy("query_id")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    val d = Retrieval.ndcgDiscountsFp(3)
    val cum = Retrieval.ndcgCumFp(3)
    // q1: hits at ranks 1 and 3 of the 3-deep ideal (n_rel=3 >= k)
    assert(out(0) == (("q1", 3L, 2L, 2.0 / 3, 2.0 / 3, 1.0,
      (d(0) + d(2)).toDouble / cum(2))))
    // q2: zero hits -> all-zero metrics, still present
    assert(out(1) == (("q2", 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("rankEval: ideal DCG truncates at min(n_rel, k)") {
    import spark.implicits._
    // n_rel=1 < k: a first-rank hit must score a PERFECT 1.0 ndcg
    val run = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query_id", "doc_id", "rnk")
    val qrels = Seq(("q", 1L)).toDF("query_id", "doc_id")
    val out = Retrieval.rankEval(run, qrels, k = 5)
      .select("ndcg_at_k", "rr").as[(Double, Double)].head()
    assert(out == ((1.0, 1.0)))
  }

  test("rankEval discounts: exact fixed-point literals, monotone") {
    val d = Retrieval.ndcgDiscountsFp(4)
    assert(d(0) == Retrieval.DiscFp) // 1/log2(2) = 1
    assert(d == d.sorted.reverse && d.distinct.size == 4)
    assert(Retrieval.ndcgCumFp(4).last == d.sum)
  }

  test("qldTopK matches a brute Dirichlet reference; missing terms get " +
      "background mass; zero-cf query terms are dropped") {
    val docs = Seq(
      (1L, "spark spark joins fast"),
      (2L, "spark windows"),
      (3L, "ducks like water water water")).toDF("doc_id", "text")
    val mu = 10.0
    val out = Retrieval.qldTopK(docs, "doc_id", "text",
      Seq("spark", "water", "nosuchterm"), k = 3, mu = mu)
      .orderBy("rnk").collect()
    // brute: |C| = 4+2+5 = 11 tokens; cf(spark)=3, cf(water)=3;
    // nosuchterm has cf 0 -> dropped, so n_terms = 2 per doc
    val texts = Map(1L -> Seq("spark", "spark", "joins", "fast"),
      2L -> Seq("spark", "windows"),
      3L -> Seq("ducks", "like", "water", "water", "water"))
    val ct = 11.0
    def score(id: Long): Double = Seq("spark" -> 3.0, "water" -> 3.0)
      .map { case (t, cf) =>
        val tf = texts(id).count(_ == t).toDouble
        val w = math.log((tf + mu * (cf / ct)) / (texts(id).size + mu))
        math.round(w * 1e6).toDouble / 1e6
      }.sum
    assert(out.forall(_.getAs[Long]("n_terms") == 2L))
    val got = out.map(r => r.getAs[Long]("doc_id")
      -> r.getAs[Double]("score")).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(math.abs(got(id) - score(id)) < 1e-6,
        s"doc $id: ${got(id)} vs brute ${score(id)}")
    }
    // ranking: doc 1 (two 'spark') must beat doc 2 (one), which beats
    // nothing-matching... doc 3 has all the 'water' mass
    val ranked = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(ranked == Seq(1L, 2L, 3L).sortBy(id => (-score(id), id)))
    graft.util.Caches.unpersistAll()
  }

  test("rm3: feedback docs' co-occurring vocabulary expands the query " +
      "and lifts docs the original query cannot see") {
    // query 'q': docs 1-3 pair q with z (the feedback set), docs 4-5
    // are about z but never say q, doc 6 is unrelated noise. Plain QLD
    // on 'q' cannot separate 4/5 from 6; RM3 learns z from feedback.
    val docs = Seq(
      (1L, "q z z a"), (2L, "q z b b"), (3L, "q z c"),
      (4L, "z z d"), (5L, "z e e"), (6L, "n n n")
    ).toDF("doc_id", "text")
    val out = Retrieval.rm3TopK(docs, "doc_id", "text", Seq("q"), k = 6,
        fbDocs = 3, fbTerms = 2).orderBy("rnk").collect()
      .map(r => r.getAs[Long]("doc_id")).toSeq
    val pos = out.zipWithIndex.toMap
    assert(pos(4L) < pos(6L) && pos(5L) < pos(6L),
      s"z-docs must outrank noise after expansion: $out")
    // layout invariance: bit-identical under repartition
    val rp = Retrieval.rm3TopK(docs.repartition(5), "doc_id", "text",
        Seq("q"), k = 6, fbDocs = 3, fbTerms = 2).orderBy("rnk").collect()
    val base = Retrieval.rm3TopK(docs, "doc_id", "text", Seq("q"), k = 6,
        fbDocs = 3, fbTerms = 2).orderBy("rnk").collect()
    assert(rp.map(_.toString).toSeq == base.map(_.toString).toSeq)
    graft.util.Caches.unpersistAll()
  }

  test("rm3: with no expansion candidates the ranking degenerates to " +
      "the original query's QLD order") {
    // feedback docs contain ONLY query terms -> the relevance model is
    // empty and rm3 is the 0.5-weighted original query: same order
    val docs = Seq(
      (1L, "q q q"), (2L, "q q"), (3L, "q"), (4L, "x y")
    ).toDF("doc_id", "text")
    val rm3 = Retrieval.rm3TopK(docs, "doc_id", "text", Seq("q"), k = 4,
        fbDocs = 2, fbTerms = 5).orderBy("rnk").collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    val qld = Retrieval.qldTopK(docs, "doc_id", "text", Seq("q"), k = 4)
      .orderBy("rnk").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(rm3 == qld, s"rm3 $rm3 vs qld $qld")
    graft.util.Caches.unpersistAll()
  }
}

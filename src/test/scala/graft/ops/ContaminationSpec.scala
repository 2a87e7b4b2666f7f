package graft.ops

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "alpha beta gamma delta epsilon zeta"), // exact copy of 0
    (2L, "one two three four five six seven"),
    (3L, "alpha beta gamma nine ten eleven twelve") // shares one shingle with 0
  ).toDF("doc_id", "text")

  test("copied eval doc reads fully contaminated, unique doc reads clean") {
    val evalSet = corpus.where($"doc_id".isin(0L, 2L))
    val out = Contamination.check(corpus, evalSet, "doc_id", "text")
      .orderBy("eval_id").collect()
    // doc 0: every shingle also in doc 1 (its copy) -> contamination 1.0
    assert(out(0).getLong(0) == 0L && out(0).getDouble(3) == 1.0)
    // doc 2: no other doc shares any shingle -> 0.0, but n_shingles real
    assert(out(1).getLong(0) == 2L && out(1).getDouble(3) == 0.0
      && out(1).getLong(1) == 5L)
  }

  test("self-match never counts: a unique eval doc inside the corpus is clean") {
    val out = Contamination.check(corpus, corpus.where($"doc_id" === 2L),
        "doc_id", "text").collect()
    assert(out.length == 1 && out(0).getLong(2) == 0L)
  }

  test("partial overlap is a fraction of the eval doc's shingles") {
    // doc 3 holds 5 shingles; exactly one ("alpha beta gamma") also in 0/1
    val out = Contamination.check(corpus, corpus.where($"doc_id" === 3L),
        "doc_id", "text").collect()(0)
    assert(out.getLong(1) == 5L && out.getLong(2) == 1L
      && out.getDouble(3) == 0.2)
  }

  test("corpus side joins map-side against a broadcast eval set") {
    val plan = Contamination.check(corpus, corpus.where($"doc_id" === 0L),
        "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side not broadcast — corpus would shuffle:\n$plan")
  }

  test("novelty: unseen-gram fraction vs a reference corpus") {
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text") // grams: "a b c", "b c d"
    val df = Seq(
      (1L, "a b c d"),    // both grams in the reference -> novelty 0
      (2L, "x y z w"),    // nothing shared -> novelty 1
      (3L, "a b c q r s") // 4 grams, one ("a b c") seen -> 3/4
    ).toDF("doc_id", "text")
    val out = Contamination.novelty(df, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((4L, 3L, 0.75)))
  }

  test("novelty of the reference against itself is zero") {
    val d = Seq((1L, "p q r s"), (2L, "p q r")).toDF("doc_id", "text")
    val out = Contamination.novelty(d, d, "doc_id", "text").collect()
    assert(out.forall(_.getDouble(3) == 0.0))
  }

  test("noveltyBloom is bit-equal to novelty, even at brutal FP rates") {
    // exact-by-construction contract: the bloom screen prunes join
    // input, never the answer — so ANY (mBits, k), including a 64-bit
    // bitmap where nearly every probe collides, must reproduce the
    // plain anti-join result on the gate fixture
    val d = spark.read.parquet(s"$sf001/documents.parquet")
    val corpus = d.where($"doc_id" % 7 =!= 0)
    val ref = d.where($"doc_id" % 7 === 0)
    val exact = Contamination.novelty(corpus, ref, "doc_id", "text")
      .collect().map(_.toString).toSet
    for ((mBits, k) <- Seq((1 << 20, 5), (1 << 10, 3), (64, 1))) {
      val bloom = Contamination.noveltyBloom(corpus, ref, "doc_id", "text",
          mBits = mBits, k = k)
        .collect().map(_.toString).toSet
      assert(bloom == exact, s"mBits=$mBits k=$k diverged")
      graft.util.Caches.unpersistAll()
    }
  }

  test("noveltyBloomBig (distributed bloom) is bit-equal to novelty") {
    // same exact-routing contract as noveltyBloom, with the bitmap as a
    // word-partitioned (w, bits) table in the plan — nothing driver-held,
    // so mBits in the 10^11 range is legal (here small, to force FPs
    // through the verify join)
    val d = spark.read.parquet(s"$sf001/documents.parquet")
    val corpus = d.where($"doc_id" % 7 =!= 0)
    val ref = d.where($"doc_id" % 7 === 0)
    val exact = Contamination.novelty(corpus, ref, "doc_id", "text")
      .collect().map(_.toString).toSet
    for ((mBits, k) <- Seq((1L << 20, 5), (1L << 10, 3), (64L, 1))) {
      val bloom = Contamination.noveltyBloomBig(corpus, ref, "doc_id",
          "text", mBits = mBits, k = k)
        .collect().map(_.toString).toSet
      assert(bloom == exact, s"mBits=$mBits k=$k diverged")
      graft.util.Caches.unpersistAll()
    }
    // the plan must contain NO data-carrying collect: the bloom rides a
    // join, not a literal — assert no array literal of the bitmap class
    val plan = Contamination.noveltyBloomBig(corpus, ref, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bloomMightContain"))
    graft.util.Caches.unpersistAll()
  }
}

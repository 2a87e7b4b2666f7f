package graft

/** Regression guard for the scale invariants PLANS.md documents: no
  * operator may plan a cartesian product, and the candidate-bounded
  * operators must join on their bucket/block keys. Checked against the
  * actual physical plans at test scale.
  */
class PlanGuardSpec extends SparkSpec {

  private val heavy = Seq(
    "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_embedding", "similarity_topk", "similarity_ann", "similarity_ivf",
    "join_agg", "window_topn", "sketch_kmv")

  test("no CartesianProduct in any operator plan") {
    heavy.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("LSH/blocked operators join on their bucket keys") {
    Seq("dedup_minhash_pairs" -> "bsig", "dedup_embedding" -> "bsig",
      "dedup_simhash_pairs" -> "bkey", "dedup_ngram_jaccard" -> "lenb")
      .foreach { case (name, key) =>
        val plan = SparkEntry.queries(name)(spark, sf001)
          .queryExecution.executedPlan.toString
        assert(plan.contains(key), s"$name plan lost its bucket key '$key'")
      }
  }

  test("top-k selection plans as TakeOrdered, not a global sort") {
    val plan = SparkEntry.queries("sketch_kmv")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}

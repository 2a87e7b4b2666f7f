package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha alpha beta", "good"),
    (2L, "alpha beta beta", "good"),
    (3L, "zork zork gork", "bad"),
    (4L, "gork zork zork", "bad"),
    (5L, "alpha beta alpha beta", "unseen"), // pos-vocab, unlabeled source
    (6L, "zork gork gork", "unseen"),        // neg-vocab, unlabeled source
    (7L, "", "unseen")                       // token-less: prior only
  ).toDF("doc_id", "text", "source")

  test("naiveBayes separates the classes it was trained on") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source") === "good", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 7, "every input doc scores exactly once")
    // held-out docs land on the side their vocabulary belongs to
    assert(out(5L)._2 > 0 && out(5L)._3, "positive-vocab doc must score > 0")
    assert(out(6L)._2 < 0 && !out(6L)._3, "negative-vocab doc must score < 0")
    // training docs classify correctly too
    assert(out(1L)._3 && out(2L)._3 && !out(3L)._3 && !out(4L)._3)
    graft.util.Caches.unpersistAll()
  }

  test("token-less docs carry the prior alone") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source") === "good", buckets = 64)
      .where(col("doc_id") === 7L).collect().head
    assert(out.getLong(1) == 0L)
    // prior = ln((2+1)/(5+1)) = ln(0.5) in micro-nats
    val expected = math.rint(math.log(3.0 / 6.0) * 1e6) / 1e6
    assert(math.abs(out.getDouble(2) - expected) < 1e-9,
      s"got ${out.getDouble(2)}, want $expected")
    graft.util.Caches.unpersistAll()
  }

  test("a one-class corpus degrades gracefully (add-one smoothing)") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source").isNotNull, buckets = 64)
      .collect()
    assert(out.length == 7)
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    assert(out.forall(_.getBoolean(3)), "all-positive corpus predicts positive")
    graft.util.Caches.unpersistAll()
  }

  test("feature hashing bounds the model: tiny bucket count still runs") {
    val out = Classify.naiveBayes(corpus, "doc_id", "text",
        col("source") === "good", buckets = 2)
    assert(out.count() == 7)
    graft.util.Caches.unpersistAll()
  }
}

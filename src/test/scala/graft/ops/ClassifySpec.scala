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

  test("rocAuc: perfect separation, inversion, ties at half, degenerate classes") {
    def auc(rows: Seq[(Boolean, Double)]): java.lang.Double = {
      val r = Classify.rocAuc(rows.toDF("label", "score"), "label", "score")
        .collect().head
      if (r.isNullAt(2)) null else r.getDouble(2)
    }
    // perfect: every positive above every negative
    assert(auc(Seq((true, 3.0), (true, 2.0), (false, 1.0), (false, 0.0)))
      == 1.0)
    // inverted scores
    assert(auc(Seq((true, 0.0), (false, 1.0))) == 0.0)
    // all scores equal: every pair is a tie -> 0.5
    assert(auc(Seq((true, 1.0), (true, 1.0), (false, 1.0))) == 0.5)
    // hand-computed with one tie: pairs (p=2, n=2): (2,1):win, (2,0):win,
    // (1,1):tie, (1,0):win -> (3 + 0.5)/4 = 0.875
    assert(auc(Seq((true, 2.0), (true, 1.0), (false, 1.0), (false, 0.0)))
      == 0.875)
    // degenerate: one class only -> NULL, not 0/0
    assert(auc(Seq((true, 1.0), (true, 2.0))) == null)
    graft.util.Caches.unpersistAll()
  }

  test("rocAuc matches the O(n^2) definition on a random batch") {
    val rnd = new scala.util.Random(12)
    val rows = Seq.fill(300)((rnd.nextBoolean(),
      (rnd.nextInt(40) - 20) / 4.0)) // coarse grid -> plenty of ties
    val got = Classify.rocAuc(rows.toDF("label", "score"), "label", "score")
      .collect().head.getDouble(2)
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val num = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val want = math.rint(num / (pos.size * neg.size) * 1e6) / 1e6
    assert(got == want, s"got $got, want $want")
    graft.util.Caches.unpersistAll()
  }

  test("confusion: hand-computed counts and ratios, empty-denominator NULL") {
    val df = Seq(
      (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false), (false, false)
    ).toDF("label", "pred")
    val r = Classify.confusion(df, "label", "pred").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 1L, 3L)))
    assert(r.getDouble(4) == math.rint(5.0 / 7.0 * 1e6) / 1e6) // accuracy
    assert(r.getDouble(5) == math.rint(2.0 / 3.0 * 1e6) / 1e6) // precision
    assert(r.getDouble(6) == math.rint(2.0 / 3.0 * 1e6) / 1e6) // recall
    assert(r.getDouble(7) == math.rint(4.0 / 6.0 * 1e6) / 1e6) // f1
    // no predicted positives: precision NULL, recall 0
    val r2 = Classify.confusion(
      Seq((true, false), (false, false)).toDF("label", "pred"),
      "label", "pred").collect().head
    assert(r2.isNullAt(5) && r2.getDouble(6) == 0.0)
  }

  test("reliabilityBins: floor binning, exact mean, pos rates") {
    val df = Seq(
      (true, 2.5), (false, 2.9),   // bin 2: rate 0.5, mean 2.7
      (true, -0.5), (true, -0.25), // bin -1: rate 1.0, mean -0.375
      (false, 0.0)                 // bin 0: rate 0.0
    ).toDF("label", "score")
    val out = Classify.reliabilityBins(df, "label", "score", binWidth = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(2L, -1L, 0L))
    assert(out(2L) == ((2L, 1L, 0.5, 2.7)))
    assert(out(-1L) == ((2L, 2L, 1.0, -0.375)))
    assert(out(0L) == ((1L, 0L, 0.0, 0.0)))
  }

  test("agreement: hand-computed kappa, skew correction, NULL handling") {
    // 2x2: a=(x,x,x,y), b=(x,x,y,y): po=3/4; marginals a:(3,1) b:(2,2)
    // pe = (3*2 + 1*2)/16 = 0.5 -> kappa = (0.75-0.5)/0.5 = 0.5
    val df = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("y", "y"))
      .toDF("a", "b")
    val r = Classify.agreement(df, "a", "b").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 0.5
      && r.getDouble(4) == 0.5)
    // both-constant equal labelers: pe = 1 -> kappa NULL (not NaN)
    val r2 = Classify.agreement(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").collect().head
    assert(r2.getDouble(2) == 1.0 && r2.isNullAt(4))
    // NULLs are a category: (null, null) agrees, (x, null) does not
    val r3 = Classify.agreement(
      Seq((null, null), ("x", null), ("x", "x"))
        .asInstanceOf[Seq[(String, String)]].toDF("a", "b"),
      "a", "b").collect().head
    assert(r3.getLong(0) == 3L && r3.getLong(1) == 2L)
    graft.util.Caches.unpersistAll()
  }
}

package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property pins for the sampling/splitting operators: the invariants the
  * 100 TB arguments rest on — pure-function-of-id determinism (layout
  * independence) and exact copy accounting — over randomized ids and
  * weights, not just the fixture corpus.
  */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g(Gen.Parameters.default.withSize(10), rng.Seed(i.toLong)))

  private val genId: Gen[Long] = Gen.chooseNum(0L, 1000000000L)
  private val genStratum: Gen[String] = Gen.oneOf("web", "book", "code", "wiki")

  private def corpus(n: Int) =
    sample(Gen.zip(genId, genStratum), n).distinctBy(_._1).toDF("id", "s")

  test("splitAssign: total, exclusive, and invariant under repartitioning") {
    val df = corpus(300)
    val fr = Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1)
    val a = Sampling.splitAssign(df, "id", fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.splitAssign(df.repartition(13), "id", fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "split depends on layout")
    assert(a.size == df.count(), "every row assigned exactly once")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("upsample: output rows = sum of per-row copy counts; copies distinct") {
    val df = corpus(200)
    val weights = Map("web" -> 2.5, "book" -> 0.5, "code" -> 1.0)
    val out = Sampling.upsample(df, "s", "id", weights, defaultWeight = 1.5)
    // per-id copy count must be floor(w) or floor(w)+1 for its stratum
    val perId = out.groupBy("id", "s").count()
      .as[(Long, String, Long)].collect()
    perId.foreach { case (id, s, n) =>
      val w = weights.getOrElse(s, 1.5)
      val base = math.floor(w).toLong
      assert(n == base || n == base + 1,
        s"id=$id stratum=$s got $n copies for weight $w")
    }
    // copy ids are 0..n-1 per row (distinct replicas)
    assert(out.distinct().count() == out.count())
    // deterministic under re-layout
    val again = Sampling.upsample(df.repartition(7), "s", "id",
      weights, defaultWeight = 1.5)
    assert(again.count() == out.count())
  }

  test("weightedTopK: the subset is a pure function of (ids, weights)") {
    val df = sample(Gen.zip(genId, Gen.chooseNum(1L, 5000L)), 250)
      .distinctBy(_._1).toDF("id", "w")
    val a = Sampling.weightedTopK(df, "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedTopK(df.repartition(11), "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    assert(a == b, "selection depends on layout")
    assert(a.size == 40)
  }
}

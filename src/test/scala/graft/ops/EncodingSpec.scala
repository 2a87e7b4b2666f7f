package graft.ops

import graft.SparkSpec

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("web"), "en"),
    (2L, Some("book"), "de"),
    (3L, None, "en"),
    (4L, Some("web"), "fr")
  ).toDF("doc_id", "source", "lang")

  test("vocab ids are 1-based ranks of the sorted distinct values") {
    val v = Encoding.vocab(df, "source")
      .as[(String, Long)].collect().toMap
    assert(v == Map("book" -> 1L, "web" -> 2L))
  }

  test("encode adds <col>_id per column; nulls stay null") {
    val out = Encoding.encode(df, Seq("source", "lang"))
      .orderBy("doc_id")
      .select("doc_id", "source_id", "lang_id")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2)))
    // source vocab: book=1, web=2; lang vocab: de=1, en=2, fr=3
    assert(out.toSeq == Seq(
      (1L, Some(2L), 2L),
      (2L, Some(1L), 1L),
      (3L, None, 2L),
      (4L, Some(2L), 3L)))
  }

  test("the corpus side never shuffles: vocab joins broadcast") {
    val plan = Encoding.encode(df, Seq("source", "lang"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
  }

  test("targetEncodeLoo: leave-one-out means, singleton and NULL " +
      "categories fall back to the global mean") {
    val rows = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0), (5L, "b", 200.0),
      (6L, "c", 7.0),               // singleton
      (7L, null, 40.0))             // null category
      .toDF("id", "cat", "y")
    val out = Encoding.targetEncodeLoo(rows, "id", "cat", "y")
      .orderBy("id").collect()
    val globalMean = (10.0 + 20 + 30 + 100 + 200 + 7 + 40) / 7
    val want = Seq(
      1L -> 25.0, 2L -> 20.0, 3L -> 15.0,  // (60 - y)/2
      4L -> 200.0, 5L -> 100.0,            // the other row
      6L -> globalMean, 7L -> globalMean)
    out.zip(want).foreach { case (r, (id, v)) =>
      assert(r.getLong(0) == id)
      assert(math.abs(r.getAs[Double]("target_loo") - v) < 1e-6,
        s"id $id: ${r.getAs[Double]("target_loo")} vs $v")
    }
    // the leakage check: an encoding must never equal the row's own y
    // when the category has other members with different values
    assert(out(0).getAs[Double]("target_loo") != 10.0)
    graft.util.Caches.unpersistAll()
  }

  test("vocab refuses high-cardinality keys loudly (maxVocab guard)") {
    val wide = (1 to 50).map(i => s"user_$i").toDF("uid")
    val ex = intercept[IllegalArgumentException] {
      Encoding.vocab(wide, "uid", maxVocab = 10).collect()
    }
    assert(ex.getMessage.contains("maxVocab")
      && ex.getMessage.contains("hash"), ex.getMessage)
    // at the boundary it still works (50 distinct <= 50)
    assert(Encoding.vocab(wide, "uid", maxVocab = 50).count() == 50)
  }

  test("woe: hand-computed smoothed WOE/IV, zero-cell stays finite, " +
      "IV = sum of terms, partitioning-invariant, loud alpha") {
    // levels: a -> 3 pos / 1 neg, b -> 1 pos / 3 neg (k=2, POS=4, NEG=4)
    val df = Seq(("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false))
      .toDF("c", "y")
    val out = sortedLevels(Encoding.woe(df, "c", "y"))
    assert(out.length == 2)
    val ra = out(0); val rb = out(1)
    assert(ra.getAs[Long]("n") == 4 && ra.getAs[Long]("n_pos") == 3)
    val psA = 3.5 / 5.0; val nsA = 1.5 / 5.0
    val wA = math.log(psA / nsA)
    assert(math.abs(ra.getAs[Double]("woe") - wA) < 1e-6)
    // symmetric construction: woe_b = -woe_a
    assert(math.abs(rb.getAs[Double]("woe") + wA) < 1e-6)
    val ivRef = (psA - nsA) * wA * 2.0
    assert(math.abs(ra.getAs[Double]("iv") - ivRef) < 1e-5)
    assert(ra.getAs[Double]("iv") == rb.getAs[Double]("iv"))
    assert(math.abs(ra.getAs[Double]("iv_term")
      + rb.getAs[Double]("iv_term") - ra.getAs[Double]("iv")) < 2e-6)
    // a level with ZERO positives is finite under the smoothing
    val zc = Seq(("a", true), ("a", true), ("z", false), ("z", false))
      .toDF("c", "y")
    val zo = sortedLevels(Encoding.woe(zc, "c", "y"))
    assert(zo.forall(r => !r.getAs[Double]("woe").isInfinite))
    assert(zo(0).getAs[Double]("woe") > 0 &&
      zo(1).getAs[Double]("woe") < 0)
    // exact level counts + snapped IV: layout cannot change a bit
    val rp = sortedLevels(Encoding.woe(df.repartition(5), "c", "y"))
    assert(out.toSeq == rp.toSeq)
    intercept[IllegalArgumentException] {
      Encoding.woe(df, "c", "y", alpha = 0.0)
    }
    graft.util.Caches.unpersistAll()
  }

  private def sortedLevels(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("level").collect()
}

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
}

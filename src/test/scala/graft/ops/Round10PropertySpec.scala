package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property pins for the round-10 operators: boilerplate removal agrees
  * with a brute-force reference on random corpora (including the
  * within-doc-repeat and fully-boilerplate edge classes), and bitext
  * mining's kept pairs equal a brute-force top-2-margin computation.
  */
class Round10PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g(Gen.Parameters.default.withSize(12), rng.Seed(i.toLong)))

  test("boilerplateChunks equals the brute-force reference on random corpora") {
    val window = 2
    val minDocs = 3
    // tiny vocabulary forces real cross-document chunk collisions
    val word = Gen.oneOf("a", "b", "c", "d")
    val text = Gen.chooseNum(1, 9).flatMap(k =>
      Gen.listOfN(k * window, word).map(_.mkString(" ")))
    val docs = sample(text, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = TextAnalysis.boilerplateChunks(
        docs.toDF("doc_id", "text"), "doc_id", "text", window, minDocs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // brute-force reference
    val chunks = docs.map { case (id, t) =>
      id -> t.split(" ").grouped(window).map(_.mkString(" ")).toSeq
    }
    val docFreq = chunks.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.size }
    val boiler = docFreq.collect { case (c, n) if n >= minDocs => c }.toSet
    chunks.foreach { case (id, cs) =>
      val kept = cs.filterNot(boiler)
      val expect = (cs.size.toLong, kept.size.toLong, kept.mkString(" "))
      assert(out(id) == expect, s"doc $id: got ${out(id)}, want $expect")
    }
    graft.util.Caches.unpersistAll()
  }

  test("bitextMine equals brute-force top-2 margin on random vectors") {
    val minMargin = 0.05
    val vec = Gen.listOfN(4, Gen.chooseNum(-5, 5)).map(_.map(_.toFloat))
      .suchThat(_.exists(_ != 0f))
    val va = sample(vec, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val vb = sample(vec, 40).zipWithIndex
      .map { case (v, i) => (1000L + i, v.toArray) }
    val out = Similarity.bitextMine(
        va.toDF("vec_id", "embedding"), vb.toDF("vec_id", "embedding"),
        minMargin)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // brute force with the operator's own rounding convention (6dp)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    }
    va.foreach { case (qid, qa) =>
      val scored = vb.map { case (nid, nb) => (nid, cos(qa, nb)) }
        .sortBy { case (nid, c) => (-c, nid) }
      val (bestId, best) = scored.head
      val second = scored.drop(1).headOption.map(_._2).getOrElse(0.0)
      val margin = best - second
      if (margin >= minMargin)
        assert(out(qid) == ((bestId, best, second, margin)),
          s"q $qid: got ${out.get(qid)}, want ($bestId, $best, $second, $margin)")
      else assert(!out.contains(qid), s"q $qid should be below margin")
    }
    graft.util.Caches.unpersistAll()
  }
}

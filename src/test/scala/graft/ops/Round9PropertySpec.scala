package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property pins for the round-9 operators: invariants over randomized
  * inputs, not just fixtures — the ordinal is a true permutation under
  * any order column; BPE merges only ever shrink token counts and never
  * cross word boundaries; the changed-key diff agrees with a brute-force
  * set computation; throttle output respects its own gap invariant.
  */
class Round9PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g(Gen.Parameters.default.withSize(12), rng.Seed(i.toLong)))

  test("globalOrdinal: permutation of 0..n-1 for random score columns") {
    val rows = sample(Gen.zip(Gen.chooseNum(0L, 1000000L),
      Gen.chooseNum(-500L, 500L)), 400).distinctBy(_._1)
    val df = rows.toDF("id", "score")
    val out = Sampling.globalOrdinal(df, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == rows.size)
    assert(out.values.toSeq.sorted == (0L until rows.size.toLong))
    // equal to the reference sort
    val ref = rows.sortBy { case (id, sc) => (sc, id) }
      .map(_._1).zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(out == ref)
    graft.util.Caches.unpersistAll()
  }

  test("bpeApplyMerges: token counts shrink monotonically with each merge") {
    val word = Gen.listOfN(6, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val text = Gen.listOfN(8, word).map(_.mkString(" "))
    val docs = sample(text, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Seq("a" -> "b", "b" -> "c", "ab" -> "c", "c" -> "a")
    val counts = (1 to merges.size).map { k =>
      TextAnalysis.bpeApplyMerges(docs, "doc_id", "text", merges.take(k))
        .agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0)
    }
    counts.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b <= a, s"a later merge grew the token count: $counts")
      case _ =>
    }
    // no merges can ever go below one token per word
    val words = docs.select(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions
        .split($"text", " ")))).head.getLong(0)
    assert(counts.last >= words)
  }

  test("changedKeys equals a brute-force set diff on random tables") {
    val genRow = Gen.zip(Gen.chooseNum(0L, 120L), Gen.chooseNum(0, 5))
    val prevRows = sample(genRow, 150).distinctBy(_._1)
    val nextRows = sample(genRow, 150).map { case (k, v) => (k + 20, v) }
      .distinctBy(_._1)
    val prev = prevRows.toDF("k", "v")
    val next = nextRows.toDF("k", "v")
    val out = Maintenance.changedKeys(prev, next, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pm = prevRows.toMap
    val nm = nextRows.toMap
    val expect =
      (nm.keySet -- pm.keySet).map(_ -> "insert") ++
        (pm.keySet -- nm.keySet).map(_ -> "delete") ++
        (pm.keySet & nm.keySet).filter(k => pm(k) != nm(k))
          .map(_ -> "update")
    assert(out == expect.toMap)
  }

  test("throttle: every kept gap >= g, every dropped row within g of a kept one") {
    val genEv = Gen.zip(Gen.chooseNum(1L, 40L), Gen.chooseNum(0L, 3000L))
    val rows = sample(genEv, 300).zipWithIndex.map { case ((k, sec), i) =>
      (i.toLong, k, new java.sql.Timestamp(sec * 1000L))
    }
    val df = rows.toDF("event_id", "user_id", "ts")
    val kept = Behavior.throttle(df, "ts", "user_id", "event_id", 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keptByKey: Map[Long, Seq[Long]] = kept.groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).sorted.toSeq }
    keptByKey.foreach { case (_, ts) =>
      ts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= 60000000L,
          s"kept events closer than the gap: $a, $b")
        case _ =>
      }
    }
    // completeness: every input row is either kept or within gap AFTER a
    // kept row of its key (otherwise the scan would have kept it)
    val keptIds = kept.map(_._3).toSet
    rows.filterNot(r => keptIds.contains(r._1)).foreach { case (id, k, t) =>
      val tm = t.getTime * 1000L
      val prior = keptByKey.getOrElse(k, Seq.empty)
        .filter(_ <= tm)
      assert(prior.nonEmpty && tm - prior.max < 60000000L,
        s"dropped row $id has no kept row within the gap before it")
    }
  }

  test("noisyCounts: expected Laplace spread over many draws") {
    // many single-count groups: the mean |noise| over groups should sit
    // near the Laplace mean absolute deviation = scale
    val df = (1L to 4000L).map(i => (i, s"g$i")).toDF("id", "g")
    val out = Pii.noisyCounts(df, Seq("g"), scale = 8.0, salt = "prop")
      .collect().map(r => math.abs(r.getLong(2) - r.getLong(1)).toDouble)
    val meanAbs = out.sum / out.size
    assert(meanAbs > 4.0 && meanAbs < 12.0,
      s"mean |noise| $meanAbs implausible for scale 8")
  }
}

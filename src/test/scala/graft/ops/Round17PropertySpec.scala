package graft.ops

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized (seeded) property pins for the round-17 statistics:
  * brute-force in-memory references for the Hodges–Lehmann order
  * statistics, the mSPRT recurrences, the per-segment Welch family
  * (vs the driver-finished [[Drift.welchT]] — bit-exact), the
  * incomplete-beta kernel's distribution identities, the script-mix
  * counters (vs codepoint-loop counting), and the cluster-size
  * histogram (vs a plain Scala groupBy).
  */
class Round17PropertySpec extends graft.SparkSpec {
  import spark.implicits._

  test("hodgesLehmann tracks the brute all-pairs order statistics on " +
      "random integer-grid data") {
    val rnd = new Random(1017)
    (0 until 3).foreach { trial =>
      val a = (0 until 40 + rnd.nextInt(60))
        .map(_ => rnd.nextInt(25).toDouble)
      val b = (0 until 40 + rnd.nextInt(60))
        .map(_ => (rnd.nextInt(25) - 5).toDouble)
      val got = Drift.hodgesLehmann(a.toDF("v"), b.toDF("v"), "v")
        .collect().head
      // brute: every pairwise difference, sorted
      val diffs = (for (x <- a; y <- b) yield x - y).sorted
      val n = diffs.length
      assert(got.getAs[Long]("n_pairs") == n.toLong)
      val med = (diffs((n + 1) / 2 - 1) + diffs((n + 2) / 2 - 1)) / 2.0
      assert(got.getAs[Double]("hl_shift") == med, s"trial $trial median")
      val c = 1.959964 * math.sqrt(a.size.toDouble * b.size.toDouble *
        (a.size + b.size + 1).toDouble / 12.0)
      val kLo = math.max(1L, math.floor(n.toDouble / 2.0 - c).toLong)
      val kHi = math.min(n.toLong, n + 1 - kLo)
      assert(got.getAs[Double]("ci_lo") == diffs(kLo.toInt - 1),
        s"trial $trial lo")
      assert(got.getAs[Double]("ci_hi") == diffs(kHi.toInt - 1),
        s"trial $trial hi")
    }
    graft.util.Caches.unpersistAll()
  }

  test("sequentialMSPRT tracks a brute per-look recurrence on random " +
      "arm streams (6dp-exact)") {
    val rnd = new Random(2017)
    val rows = (0 until 2000).map { _ =>
      val look = rnd.nextInt(5).toLong
      val arm = if (rnd.nextBoolean()) "a" else "b"
      val s = rnd.nextDouble() < (if (arm == "a") 0.4 else 0.3)
      (look, arm, s)
    }
    val got = Drift.sequentialMSPRT(rows.toDF("look", "arm", "s"),
      "look", "arm", "s", "a", "b").collect()
    // brute recurrence over cumulative exact counts
    var pmin = Double.NaN
    (0L until 5L).foreach { l =>
      val upto = rows.filter(_._1 <= l)
      val na = upto.count(_._2 == "a"); val ka = upto.count(r =>
        r._2 == "a" && r._3)
      val nb = upto.count(_._2 == "b"); val kb = upto.count(r =>
        r._2 == "b" && r._3)
      val ra = ka.toDouble / na; val rb = kb.toDouble / nb
      val v = ra * (1.0 - ra) / na + rb * (1.0 - rb) / nb
      val th = ra - rb
      val lam = math.sqrt(v / (v + 0.01)) *
        math.exp((th * th * 0.01) / (2.0 * v * (v + 0.01)))
      val praw = math.min(1.0, 1.0 / lam)
      pmin = if (pmin.isNaN) praw else math.min(pmin, praw)
      val row = got.find(_.getAs[Long]("look") == l).get
      assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("k_a") == ka)
      assert(math.abs(row.getAs[Double]("p_seq")
        - graft.functions.PValues.round6(pmin)) < 1e-9, s"look $l")
    }
    graft.util.Caches.unpersistAll()
  }

  test("welchBySegment == welchT per slice on random segmented values " +
      "(bit-exact, including the in-plan ibeta p)") {
    val rnd = new Random(3017)
    val segs = Seq("s1", "s2", "s3", "s4")
    val rows = (0 until 1200).map { _ =>
      val s = segs(rnd.nextInt(segs.size))
      val arm = if (rnd.nextBoolean()) "a" else "b"
      val v = math.round((rnd.nextGaussian() * 4 +
        (if (arm == "a") 10 + segs.indexOf(s) else 10)) * 4) / 4.0
      (s, arm, v)
    }
    val df = rows.toDF("seg", "arm", "v")
    val got = Drift.welchBySegment(df, "seg", "arm", "v", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    segs.foreach { s =>
      val sl = rows.filter(_._1 == s)
      val ref = Drift.welchT(
        sl.filter(_._2 == "a").map(_._3).toDF("v"),
        sl.filter(_._2 == "b").map(_._3).toDF("v"), "v").collect().head
      val g = got(s)
      Seq("mean_a", "mean_b", "var_a", "var_b", "t", "dof").foreach(c =>
        assert(g.getAs[Double](c) == ref.getAs[Double](c), s"$s.$c"))
      assert(g.getAs[Double]("p_t") == ref.getAs[Double]("p_t"), s"$s.p_t")
    }
    graft.util.Caches.unpersistAll()
  }

  test("ibetaReg distribution identities on random parameters: " +
      "complement, uniform case, t/F bridge") {
    val rnd = new Random(4017)
    import graft.functions.PValues
    (0 until 200).foreach { _ =>
      val a = 0.5 + rnd.nextInt(40) * 0.5
      val b = 0.5 + rnd.nextInt(8) * 0.5
      val x = rnd.nextDouble()
      // complement: I_x(a,b) + I_{1-x}(b,a) = 1
      val s = PValues.ibetaReg(x, a, b) + PValues.ibetaReg(1.0 - x, b, a)
      assert(math.abs(s - 1.0) < 1e-9, s"complement a=$a b=$b x=$x")
      // I_x(1,1) = x (uniform)
      assert(math.abs(PValues.ibetaReg(x, 1.0, 1.0) - x) < 1e-12)
      // t² -> F(1, dof) bridge at random t/dof
      val t = rnd.nextDouble() * 6
      val dof = 1.0 + rnd.nextInt(200)
      assert(math.abs(PValues.fSurvival(t * t, 1.0, dof)
        - PValues.pStudentT2(t, dof)) < 1e-9, s"bridge t=$t dof=$dof")
    }
  }

  test("scriptMix counts match a brute codepoint loop on random " +
      "mixed-script strings") {
    val rnd = new Random(5017)
    val alphabet = "abXY09 \t" + "фщЖ" + "中文漢" + "ぁカ" + "한글" +
      "ابج" + "אב" + "कख" + "αΩ" + ":;!"
    val texts = (0 until 50).map { i =>
      (i.toLong, (0 until rnd.nextInt(80))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = TextAnalysis.scriptMix(texts.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def in(c: Char, lo: Int, hi: Int) = c >= lo && c <= hi
    texts.foreach { case (id, t) =>
      val r = got(id)
      assert(r.getAs[Long]("n_chars") == t.length.toLong)
      assert(r.getAs[Long]("n_latin") ==
        t.count(c => c.isLetter && c < 128).toLong)
      assert(r.getAs[Long]("n_cyrillic") ==
        t.count(in(_, 0x400, 0x4FF)).toLong)
      assert(r.getAs[Long]("n_cjk") ==
        t.count(in(_, 0x4E00, 0x9FFF)).toLong)
      assert(r.getAs[Long]("n_kana") ==
        t.count(in(_, 0x3040, 0x30FF)).toLong)
      assert(r.getAs[Long]("n_hangul") ==
        t.count(in(_, 0xAC00, 0xD7AF)).toLong)
      assert(r.getAs[Long]("n_arabic") ==
        t.count(in(_, 0x600, 0x6FF)).toLong)
      assert(r.getAs[Long]("n_hebrew") ==
        t.count(in(_, 0x590, 0x5FF)).toLong)
      assert(r.getAs[Long]("n_devanagari") ==
        t.count(in(_, 0x900, 0x97F)).toLong)
      assert(r.getAs[Long]("n_greek") ==
        t.count(in(_, 0x370, 0x3FF)).toLong)
      assert(r.getAs[Long]("n_ws") ==
        t.count(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
          .toLong)
      // counts partition the length
      val covered = Seq("latin", "digit", "cyrillic", "greek", "cjk",
        "kana", "hangul", "arabic", "hebrew", "devanagari")
        .map(n => r.getAs[Long](s"n_$n")).sum + r.getAs[Long]("n_ws") +
        r.getAs[Long]("n_other")
      assert(covered == t.length.toLong, s"partition doc $id")
    }
    graft.util.Caches.unpersistAll()
  }

  test("clusterStats matches a brute histogram on random component " +
      "assignments") {
    val rnd = new Random(6017)
    val nDocs = 500
    // ~60% of docs land in clusters of size 2..6
    val assignments = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var doc = 0L
    var compId = 0L
    while (doc < nDocs * 6 / 10) {
      val size = 2 + rnd.nextInt(5)
      (0 until size).foreach(i => assignments += ((doc + i, compId)))
      doc += size; compId += 1
    }
    val clustered = doc
    val df = (0L until nDocs.toLong).map(i => (i, s"d$i"))
      .toDF("doc_id", "text")
    val comps = assignments.toSeq.toDF("doc_id", "component")
    val got = Dedup.clusterStats(df, comps).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val bruteSizes = assignments.groupBy(_._2).map(_._2.size)
    val bruteHist = bruteSizes.groupBy(identity).map { case (k, v) =>
      k.toLong -> v.size.toLong }
    bruteHist.foreach { case (size, nc) =>
      val (gn, gd, gs) = got(size)
      assert(gn == nc && gd == size * nc, s"size $size")
      assert(gs == graft.functions.PValues.round6(
        size * nc.toDouble / nDocs))
    }
    assert(got(1L)._2 == nDocs - clustered)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-6)
    graft.util.Caches.unpersistAll()
  }
}

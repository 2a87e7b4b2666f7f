package graft.functions

import graft.SparkSpec
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** The native Catalyst expressions are the FAST PATH; the declarative
  * higher-order-function formulations they replaced are the SPEC (and the
  * shape the DuckDB oracles replay). This suite pins them together over
  * randomized inputs: for every generated row the native column must equal
  * the declarative column BIT-FOR-BIT — doubles included, since the whole
  * determinism contract rests on exact agreement.
  */
class ExpressionsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val P = T.P

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g(Gen.Parameters.default.withSize(10), rng.Seed(i.toLong)))

  private val genWord: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(l => Gen.listOfN(l, Gen.alphaNumChar)).map(_.mkString)
  private val genText: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, genWord)).map(_.mkString(" "))
  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 250.0f))

  private def assertAgree(df: org.apache.spark.sql.DataFrame,
      native: Column, declarative: Column, what: String): Unit = {
    val bad = df.select(native.as("n"), declarative.as("d"))
      .where(not(col("n") <=> col("d")))
    assert(bad.isEmpty, s"$what: native != declarative: ${bad.head(3).toSeq}")
  }

  test("minhash_sig equals the declarative k-permutation formula") {
    val df = sample(genText, 150).toDF("text")
      .select(T.shingleHashes(T.words(col("text"))).as("hs"))
    val k = 16
    val declarative = transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(col("hs"), h =>
        (((i + 1) * 2654435761L % P) * h + ((i + 1) * 40503L % P)) % P)))
    assertAgree(df, T.minhashSig(col("hs"), k), declarative, "minhash_sig")
  }

  test("sign_bits equals the declarative hyperplane formula") {
    val df = sample(genVec, 150).toDF("emb")
    val nBits = 24
    val dim = 8
    val declarative = transform(sequence(lit(0), lit(nBits - 1)), j =>
      when(aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, d) =>
        acc + element_at(col("emb"), d).cast("double") *
          (((j * dim + (d - 1)) * 2654435761L) % 97 - 48).cast("double"))
        >= 0, 1L).otherwise(0L))
    assertAgree(df, V.signBits(col("emb"), nBits), declarative, "sign_bits")
  }

  test("oph_sig equals an independent reference implementation") {
    def refOph(hs: Seq[Long], k: Int): Seq[Long] = {
      if (hs.isEmpty) return Seq.fill(k)(0L)
      val byBucket = hs.groupBy(h => (h % k).toInt).map { case (b, v) => b -> v.min }
      (0 until k).map { j =>
        Iterator.from(0).map(t => (j + t) % k)
          .collectFirst { case b if byBucket.contains(b) => byBucket(b) }.get
      }
    }
    val k = 16
    val rows = sample(genText, 200).toDF("text")
      .select(T.shingleHashes(T.words(col("text"))).as("hs"))
      .select(col("hs"), T.ophSig(col("hs"), k).as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      val sig = r.getSeq[Long](1)
      assert(sig == refOph(hs, k), s"hashes $hs")
    }
  }

  test("pack_bits equals the declarative shift-or fold, sign bit included") {
    val df = sample(genVec, 150).toDF("emb")
      .select(V.signBits(col("emb"), 64).as("sb"))
    val declarative = expr(
      """aggregate(zip_with(sb, sequence(0, 63), (bt, j) -> shiftleft(bt, j)),
         0L, (acc, x) -> acc | x)""")
    assertAgree(df, V.packBits(col("sb")), declarative, "pack_bits")
    // hamming(pack(a), pack(b)) == per-bit disagreement count
    val pairs = sample(Gen.zip(genVec, genVec), 150).toDF("a", "b")
      .select(V.signBits(col("a"), 64).as("sa"), V.signBits(col("b"), 64).as("sb"))
    assertAgree(pairs,
      V.hamming(V.packBits(col("sa")), V.packBits(col("sb"))),
      aggregate(zip_with(col("sa"), col("sb"), (x, y) => abs(x - y)),
        lit(0L), (acc, v) => acc + v),
      "hamming")
  }

  test("dot_product equals the sequential aggregate(zip_with) form, bit for bit") {
    val pairs = sample(Gen.zip(genVec, genVec), 200)
    val df = pairs.toDF("a", "b")
    val declarative = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    assertAgree(df, V.dot(col("a"), col("b")), declarative, "dot_product")
  }

  test("squared_l2 equals the sequential aggregate(zip_with) form, bit for bit") {
    val pairs = sample(Gen.zip(genVec, genVec), 200)
    val df = pairs.toDF("a", "b")
    val declarative = aggregate(
      zip_with(col("a"), col("b"), (x, y) => {
        val xd = x.cast("double"); val yd = y.cast("double")
        (xd - yd) * (xd - yd)
      }),
      lit(0.0), (acc, x) => acc + x)
    val native = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.Expressions.SquaredL2(
        org.apache.spark.sql.GraftColumnBridge.expression(col("a")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("b"))))
    assertAgree(df, native, declarative, "squared_l2")
  }

  test("hashed word n-grams equal the declarative shingle+hash+distinct chain") {
    val df = sample(genText, 200).toDF("text")
    val declarative = array_sort(array_distinct(
      T.shingleHashes(T.wordShingles(col("text"), 3))))
    assertAgree(df, array_sort(T.hashedWordNgrams(col("text"), 3)),
      declarative, "hashed_word_ngrams")
  }

  test("hashed char n-grams equal the declarative shingle+hash+winnow chain") {
    val df = sample(genText, 200).toDF("text")
    val mod = 4
    val declarative = array_sort(filter(
      array_distinct(T.shingleHashes(T.charShingles(col("text"), 5))),
      h => h % mod === 0))
    assertAgree(df, array_sort(T.hashedCharNgrams(col("text"), 5, mod)),
      declarative, "hashed_char_ngrams")
  }

  test("jaro_winkler indexed matcher equals an independent naive spec") {
    // the kernel's counting-sort + cursor matching (O(l1+l2)) must agree
    // bit-for-bit with the textbook O(l1·window) scan it replaced —
    // including heavy char repeats, where cursor bookkeeping is hardest
    def naiveJw(s1: String, s2: String): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 && l2 == 0) return 1.0
      if (l1 == 0 || l2 == 0) return 0.0
      val w = math.max(0, math.max(l1, l2) / 2 - 1)
      val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
      var m = 0
      for (i <- 0 until l1) {
        var j = math.max(0, i - w); var found = false
        val hi = math.min(l2 - 1, i + w)
        while (j <= hi && !found) {
          if (!m2(j) && s1(i) == s2(j)) { m1(i) = true; m2(j) = true; m += 1; found = true }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var (half, k) = (0, 0)
      for (i <- 0 until l1 if m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) half += 1
        k += 1
      }
      val t = half / 2
      val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
      if (jaro <= 0.7) return jaro
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
    // skew to a tiny alphabet so repeats and cursor expiry are exercised;
    // the long generator crosses the l1+l2 >= 96 indexing gate, the short
    // one stays on the naive path — both must equal the spec
    val genRep: Gen[String] = Gen.chooseNum(0, 40)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', ' '))).map(_.mkString)
    val genRepLong: Gen[String] = Gen.chooseNum(80, 200)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', ' '))).map(_.mkString)
    val pairs = sample(Gen.zip(genRep, genRep), 400) ++
      sample(Gen.zip(genRepLong, genRepLong), 200) ++
      sample(Gen.zip(genText, genText), 200)
    pairs.foreach { case (s1, s2) =>
      val fast = ExprKernels.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(s1),
        org.apache.spark.unsafe.types.UTF8String.fromString(s2))
      assert(fast == naiveJw(s1, s2), s"jw mismatch on '$s1' vs '$s2'")
    }
  }

  test("char_entropy equals the declarative micro-nat histogram formula") {
    val df = sample(genText, 200).toDF("text")
    val chars = split(col("text"), "")
    val n = length(col("text")).cast("double")
    val micro = aggregate(
      transform(array_distinct(chars), c =>
        size(filter(chars, x => x === c)).cast("long")),
      lit(0L), (acc, c) =>
        acc + c * round(log(c.cast("double") / n) * lit(1e6)).cast("long"))
    val declarative = when(length(col("text")) === 0, lit(0.0))
      .otherwise(round(-micro.cast("double") / lit(1e6) / n, 6) + lit(0.0))
    assertAgree(df, T.charEntropy(col("text")), declarative, "char_entropy")
  }

  test("sorted_intersect equals array_intersect on sorted distinct long arrays") {
    val genArr: Gen[Seq[Long]] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 30L))).map(_.distinct.sorted.toSeq)
    val df = sample(Gen.zip(genArr, genArr), 200).toDF("a", "b")
    def si(a: Column, b: Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.Expressions.SortedIntersect(
          org.apache.spark.sql.GraftColumnBridge.expression(a),
          org.apache.spark.sql.GraftColumnBridge.expression(b)))
    // array_intersect keeps first-array order = ascending on sorted
    // distinct inputs, so the two must agree element-for-element
    assertAgree(df, si(col("a"), col("b")),
      array_intersect(col("a"), col("b")), "sorted_intersect")
  }
}

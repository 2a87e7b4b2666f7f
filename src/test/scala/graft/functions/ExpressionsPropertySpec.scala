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

  test("dot_product equals the sequential aggregate(zip_with) form, bit for bit") {
    val pairs = sample(Gen.zip(genVec, genVec), 200)
    val df = pairs.toDF("a", "b")
    val declarative = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    assertAgree(df, V.dot(col("a"), col("b")), declarative, "dot_product")
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
}

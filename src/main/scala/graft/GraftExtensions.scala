package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.Expressions

/** SQL surface for graft's native expressions. Two ways in:
  *
  *  - session builder: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *    (the idiomatic SparkSessionExtensions route), or
  *  - [[GraftFunctions.register]] on a live session (temp functions).
  *
  * Registered functions:
  *  - `minhash_sig(array<long> hashes, k)`   -> array<long> signature
  *  - `sign_bits(array<float> emb, nBits)`   -> array<long> 0/1 bits
  *  - `simhash_bits(array<long> wordHashes, nBits)` -> long fingerprint
  *  - `dot_product(array<float>, array<float>)` -> double
  *  - `jaro_winkler_sim(string, string)` -> double in [0,1]
  *  - `char_entropy(string)` -> double (nats, 6dp micro-nat contract)
  *  - `hilbert_index(long x, long y, bits)` -> long curve position
  *  - `hilbert_index_n(array<long> coords, bits)` -> long (Skilling N-D)
  *  - `perceptual_hash(binary)` -> long 60-bit aHash fingerprint
  *  - `sorted_intersect(array<long>, array<long>)` -> array<long>
  *  - `sorted_jaccard(array<long>, array<long>)` -> double (sorted sets)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.implClass(name), name),
        builder))
    }
}

object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** Implementing expression class per function (for ExpressionInfo /
    * DESCRIBE FUNCTION metadata).
    */
  def implClass(name: String): String = name match {
    case "minhash_sig"      => classOf[Expressions.MinHashSig].getName
    case "sign_bits"        => classOf[Expressions.SignBits].getName
    case "simhash_bits"     => classOf[Expressions.SimHashBits].getName
    case "jaro_winkler_sim" => classOf[Expressions.JaroWinklerSim].getName
    case "char_entropy"     => classOf[Expressions.CharEntropy].getName
    case "hilbert_index"    => classOf[Expressions.HilbertIndex].getName
    case "hilbert_index_n"  => classOf[Expressions.HilbertIndexN].getName
    case "perceptual_hash"  => classOf[Expressions.PerceptualHash].getName
    case "sorted_intersect" => classOf[Expressions.SortedIntersect].getName
    case "sorted_jaccard"   => classOf[Expressions.SortedJaccard].getName
    case _                  => classOf[Expressions.DotProduct].getName
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> (es => Expressions.MinHashSig(es.head, litInt(es(1), "k"))),
    "sign_bits" -> (es => Expressions.SignBits(es.head, litInt(es(1), "nBits"))),
    "simhash_bits" -> (es => Expressions.SimHashBits(es.head, litInt(es(1), "nBits"))),
    "dot_product" -> (es => Expressions.DotProduct(es.head, es(1))),
    "jaro_winkler_sim" -> (es => Expressions.JaroWinklerSim(es.head, es(1))),
    "char_entropy" -> (es => Expressions.CharEntropy(es.head)),
    "hilbert_index" -> (es =>
      Expressions.HilbertIndex(es.head, es(1), litInt(es(2), "bits"))),
    "hilbert_index_n" -> (es =>
      Expressions.HilbertIndexN(es.head, litInt(es(1), "bits"))),
    "perceptual_hash" -> (es => Expressions.PerceptualHash(es.head)),
    "sorted_intersect" -> (es => Expressions.SortedIntersect(es.head, es(1))),
    "sorted_jaccard" -> (es => Expressions.SortedJaccard(es.head, es(1))))

  /** Register on a live session as temp functions. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash/sketch inner loops.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * interpreted per element — measured ~6µs/element on the MinHash and
  * sign-LSH kernels, i.e. tens of ms per ROW. These expressions run the
  * same arithmetic as tight primitive JVM loops (one expression eval per
  * row; the loop is JIT-compiled), which is the documented preference
  * order: built-ins, then a native `Expression`, then a UDF.
  *
  * DETERMINISM CONTRACT: each expression computes bit-for-bit the same
  * result as the declarative formulation it replaces (and as the DuckDB
  * oracle SQL in [[graft.queries.ExtensionQueries]]):
  *  - MinHashSig:   min over shingle hashes of ((i+1)*2654435761 % P * h
  *                  + (i+1)*40503 % P) % P, P = 1000000007.
  *  - SignBits:     bit j = [ sum_d emb(d) * (((j*dim+d)*2654435761) % 97
  *                  - 48) >= 0 ], accumulated in double, d ascending
  *                  (sequential sum = same IEEE result as the zip_with/
  *                  aggregate form).
  *  - SimHashBits:  bit j of word-hash h via (h >> j) & 1 — identical to
  *                  floor(h / 2^j) % 2 for h >= 0.
  */
object Expressions {

  val P = 1000000007L

  /** k-permutation MinHash over an array<long> of shingle hashes in [0,P). */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    private lazy val as: Array[Long] =
      Array.tabulate(k)(i => (i + 1) * 2654435761L % P)
    private lazy val bs: Array[Long] =
      Array.tabulate(k)(i => (i + 1) * 40503L % P)

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val out = Array.fill(k)(P)
      var s = 0
      val n = hs.numElements()
      while (s < n) {
        val h = hs.getLong(s)
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % P
          if (v < out(i)) out(i) = v
          i += 1
        }
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** Sign-LSH bits of an array<float> embedding against the fixed
    * deterministic hyperplane family. Returns array<long> of 0/1.
    */
  case class SignBits(child: Expression, nBits: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    // plane(j, d) depends on the vector dimension; cache per dim seen.
    @transient private lazy val planeCache =
      new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
    private def planes(dim: Int): Array[Array[Double]] =
      planeCache.computeIfAbsent(dim, d =>
        Array.tabulate(nBits, d)((j, k) =>
          ((j.toLong * d + k) * 2654435761L % 97 - 48).toDouble))

    override def nullSafeEval(input: Any): Any = {
      val emb = input.asInstanceOf[ArrayData]
      val dim = emb.numElements()
      val pl = planes(dim)
      val v = new Array[Double](dim)
      var d = 0
      while (d < dim) { v(d) = emb.getFloat(d).toDouble; d += 1 }
      val out = new Array[Long](nBits)
      var j = 0
      while (j < nBits) {
        val p = pl(j)
        var s = 0.0
        var i = 0
        while (i < dim) { s += v(i) * p(i); i += 1 }
        out(j) = if (s >= 0) 1L else 0L
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): SignBits = copy(child = c)
    override def prettyName: String = "sign_bits"
  }

  /** `nBits`-bit SimHash from an array<long> of word hashes (each hash must
    * carry at least nBits of entropy). nBits <= 62 so the fingerprint and
    * every power-of-two used in the banded replay fit a signed 64-bit lane
    * in BOTH engines (DuckDB BIGINT has no unsigned escape hatch).
    */
  case class SimHashBits(child: Expression, nBits: Int)
      extends UnaryExpression with CodegenFallback {
    require(nBits > 0 && nBits <= 62, s"nBits must be in [1,62], got $nBits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val votes = new Array[Long](nBits)
      var s = 0
      while (s < n) {
        val h = hs.getLong(s)
        var j = 0
        while (j < nBits) {
          votes(j) += ((h >> j) & 1L) * 2L - 1L
          j += 1
        }
        s += 1
      }
      var acc = 0L
      var j = 0
      while (j < nBits) {
        if (votes(j) >= 0) acc += 1L << j
        j += 1
      }
      java.lang.Long.valueOf(acc)
    }
    override protected def withNewChildInternal(c: Expression): SimHashBits = copy(child = c)
    override def prettyName: String = "simhash_bits"
  }

  private val threadMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars of the utf8 bytes as an unsigned 32-bit value,
    * mod P — identical to `conv(substring(md5(s),1,8),16,10) % P` and to
    * DuckDB's `('0x'||substr(md5(s),1,8))::BIGINT % P`.
    */
  private def md5h32(bytes: Array[Byte]): Long = {
    val d = threadMd5.get()
    d.reset()
    val h = d.digest(bytes)
    (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16)
      | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % P
  }

  /** Distinct hashed word n-gram shingles of a text (whole-text fallback
    * below n words) — the fused, loop-form equivalent of
    * wordShingles -> shingleHashes -> distinct. Word split is on a single
    * space with trailing empties kept, matching Spark's `split(text, " ")`
    * and DuckDB's `string_split(text, ' ')`.
    */
  case class HashedWordNgrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val words = text.split(" ", -1)
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      if (words.length >= n) {
        var i = 0
        while (i <= words.length - n) {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
          out.add(md5h32(sb.toString.getBytes("UTF-8")))
          i += 1
        }
      } else out.add(md5h32(text.getBytes("UTF-8")))
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): HashedWordNgrams = copy(child = c)
    override def prettyName: String = "hashed_word_ngrams"
  }

  /** Distinct hashed character n-gram shingles, winnowed to hashes ≡ 0
    * (mod sampleMod) — fused charShingles -> h32 -> distinct -> mod-filter.
    * sampleMod=1 keeps everything. Substrings are by Unicode code point,
    * matching Spark `substring` and DuckDB `substr` character semantics.
    */
  case class HashedCharNgrams(child: Expression, n: Int, sampleMod: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      val cps = text.codePointCount(0, text.length)
      if (cps >= n) {
        var start = 0
        var i = 0
        while (i <= cps - n) {
          val end = {
            var e = start
            var k = 0
            while (k < n) { e = text.offsetByCodePoints(e, 1); k += 1 }
            e
          }
          val h = md5h32(text.substring(start, end).getBytes("UTF-8"))
          if (h % sampleMod == 0) out.add(h)
          start = text.offsetByCodePoints(start, 1)
          i += 1
        }
      } else {
        val h = md5h32(text.getBytes("UTF-8"))
        if (h % sampleMod == 0) out.add(h)
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): HashedCharNgrams = copy(child = c)
    override def prettyName: String = "hashed_char_ngrams"
  }

  /** Sequential-double dot product of two float or double arrays (same
    * accumulation order as the `aggregate(zip_with(...))` form; float
    * elements widen to double exactly, so mixing a float corpus vector
    * with a double k-means centroid is still bit-deterministic).
    * Mismatched lengths yield NULL — exactly what zip_with's null-padding
    * produces through the aggregate — rather than silently truncating,
    * which would mask a corrupt embedding behind a plausible-looking
    * score.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    // Reachable from SQL via the registered `dot_product` function, so the
    // element type must be checked: an array<int> falling into the
    // getDouble branch would read garbage from 4-byte slots.
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def vecLike(e: Expression): Boolean = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _                                    => false
      }
      if (vecLike(left) && vecLike(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> on both sides, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

    private def floatElems(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    @transient private lazy val leftFloat = floatElems(left)
    @transient private lazy val rightFloat = floatElems(right)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        val xe = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val ye = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        s += xe * ye
        i += 1
      }
      java.lang.Double.valueOf(s)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product"
  }
}

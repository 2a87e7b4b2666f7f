package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
  * Every expression implements BOTH `eval` and `doGenCode`, each a
  * one-line delegation to the same [[ExprKernels]] static method — the
  * two paths are bit-identical by construction, and the generated form
  * keeps the surrounding Project/Filter INSIDE WholeStageCodegen (a
  * CodegenFallback expression evicts its whole stage to the interpreted
  * row-by-row path, which is how these kernels ran until round 8).
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

  val P = ExprKernels.P

  private val Kernels = "graft.functions.ExprKernels"

  /** k-permutation MinHash over an array<long> of shingle hashes in [0,P). */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.minhashSig(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.minhashSig($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** Unicode NFC normalization (UAX #15 canonical composition) — the
    * pre-dedup/pre-tokenizer hygiene step: decomposed "e + combining
    * acute" and composed "é" must hash identically or exact/near dedup
    * silently misses equal documents. JDK Normalizer under the same
    * codegen discipline as the hash kernels; quick-check fast path for
    * the already-normalized majority.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.nfc($c)")
    override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
    override def prettyName: String = "nfc_normalize"
  }

  /** `passes` sequential applications of a pinned literal replace table
    * — the mojibake repair chain as ONE expression with the table as a
    * codegen reference object, instead of table.size × passes nested
    * `replace` Columns (which overflow the analyzer stack past ~200
    * levels). Literal, non-overlapping, left-to-right — the exact
    * semantics of the nested-SQL-replace oracle.
    */
  case class ChainReplace(child: Expression, table: Array[String],
      passes: Int) extends UnaryExpression {
    require(table.nonEmpty && table.length % 2 == 0,
      "table must be non-empty [match, replacement] pairs, flattened")
    require(passes >= 1, s"passes must be >= 1, got $passes")
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.chainReplace(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        table, passes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("replaceTable", table,
        "java.lang.String[]")
      defineCodeGen(ctx, ev, c => s"$Kernels.chainReplace($c, $ref, $passes)")
    }
    override protected def withNewChildInternal(c: Expression): ChainReplace =
      copy(child = c)
    override def prettyName: String = "chain_replace"
  }

  /** One-Permutation MinHash with rotation densification — one pass over
    * the shingle hashes vs [[MinHashSig]]'s k permutations.
    */
  case class OphSig(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, s"signature length must be >= 1, got $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.ophSig(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.ophSig($c, $k)")
    override protected def withNewChildInternal(c: Expression): OphSig = copy(child = c)
    override def prettyName: String = "oph_sig"
  }

  /** Sign-LSH bits of an array<float> embedding against the fixed
    * deterministic hyperplane family. Returns array<long> of 0/1.
    */
  case class SignBits(child: Expression, nBits: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.signBits(input.asInstanceOf[ArrayData], nBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.signBits($c, $nBits)")
    override protected def withNewChildInternal(c: Expression): SignBits = copy(child = c)
    override def prettyName: String = "sign_bits"
  }

  /** Pack an array<long> of 0/1 bits into one signed 64-bit Hamming code
    * (LSB-first). Pairs with [[SignBits]]: `pack_bits(sign_bits(emb, 64))`
    * is the 8-byte binary quantization of a float embedding, searched by
    * `bit_count(a ^ b)` — both Spark built-ins, so the distance itself
    * stays in whole-stage codegen with zero custom code.
    */
  case class PackBits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.packBits(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.packBits($c)")
    override protected def withNewChildInternal(c: Expression): PackBits = copy(child = c)
    override def prettyName: String = "pack_bits"
  }

  /** `nBits`-bit SimHash from an array<long> of word hashes (each hash must
    * carry at least nBits of entropy). nBits <= 62 so the fingerprint and
    * every power-of-two used in the banded replay fit a signed 64-bit lane
    * in BOTH engines (DuckDB BIGINT has no unsigned escape hatch).
    */
  case class SimHashBits(child: Expression, nBits: Int) extends UnaryExpression {
    require(nBits > 0 && nBits <= 62, s"nBits must be in [1,62], got $nBits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.simhashBits(input.asInstanceOf[ArrayData], nBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.simhashBits($c, $nBits)")
    override protected def withNewChildInternal(c: Expression): SimHashBits = copy(child = c)
    override def prettyName: String = "simhash_bits"
  }

  /** Distinct hashed word n-gram shingles of a text (whole-text fallback
    * below n words) — the fused, loop-form equivalent of
    * wordShingles -> shingleHashes -> distinct. Word split is on a single
    * space with trailing empties kept, matching Spark's `split(text, " ")`
    * and DuckDB's `string_split(text, ' ')`.
    */
  case class HashedWordNgrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.hashedWordNgrams(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.hashedWordNgrams($c, $n)")
    override protected def withNewChildInternal(c: Expression): HashedWordNgrams = copy(child = c)
    override def prettyName: String = "hashed_word_ngrams"
  }

  /** POSITIONAL hashed word n-grams — ordered, duplicates kept (span/run
    * analysis needs positions; [[HashedWordNgrams]] is the distinct set).
    */
  case class HashedWordNgramSeq(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.hashedWordNgramSeq(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.hashedWordNgramSeq($c, $n)")
    override protected def withNewChildInternal(c: Expression): HashedWordNgramSeq = copy(child = c)
    override def prettyName: String = "hashed_word_ngram_seq"
  }

  /** Distinct hashed character n-gram shingles, winnowed to hashes ≡ 0
    * (mod sampleMod) — fused charShingles -> h32 -> distinct -> mod-filter.
    * sampleMod=1 keeps everything. Substrings are by Unicode code point,
    * matching Spark `substring` and DuckDB `substr` character semantics.
    */
  case class HashedCharNgrams(child: Expression, n: Int, sampleMod: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.hashedCharNgrams(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, sampleMod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.hashedCharNgrams($c, $n, $sampleMod)")
    override protected def withNewChildInternal(c: Expression): HashedCharNgrams = copy(child = c)
    override def prettyName: String = "hashed_char_ngrams"
  }

  /** Jaro-Winkler similarity of two strings ([[ExprKernels.jaroWinkler]]
    * — rapidfuzz-compatible semantics, so DuckDB's
    * `jaro_winkler_similarity` replays it bit-for-bit on ASCII text).
    * A native expression because the match-window scan is a per-row
    * O(len·window) loop with two scratch arrays — inexpressible with
    * built-ins short of a position cross-explode, and a UDF would evict
    * the verification filter from WholeStageCodegen.
    */
  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.jaroWinkler(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernels.jaroWinkler($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
      copy(left = l, right = r)
    override def prettyName: String = "jaro_winkler_sim"
  }

  /** N-dimensional Hilbert index of an array<long> of coordinates
    * ([[ExprKernels.hilbertN]], Skilling's transpose). Native for the
    * same reason as [[HilbertIndex]]: the per-level axis mutations are
    * stateful and sequential.
    */
  case class HilbertIndexN(child: Expression, bits: Int)
      extends UnaryExpression {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.hilbertN(input.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.hilbertN($c, $bits)")
    override protected def withNewChildInternal(c: Expression): HilbertIndexN = copy(child = c)
    override def prettyName: String = "hilbert_index_n"
  }

  /** 60-bit perceptual average-hash of a binary payload
    * ([[ExprKernels.perceptualHash60]]) — the media-bytes sibling of
    * [[SimHashBits]]. Native: Spark has no byte-level fold over
    * BinaryType short of a UDF, and this sits in the hot decode path.
    */
  case class PerceptualHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.perceptualHash60(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.perceptualHash60($c)")
    override protected def withNewChildInternal(c: Expression): PerceptualHash = copy(child = c)
    override def prettyName: String = "perceptual_hash"
  }

  /** 2-D Hilbert curve index ([[ExprKernels.hilbert2]]). Native because
    * the per-level flip/transpose is stateful: a declarative unrolling
    * needs one projection per level and re-derives the quadrant bits from
    * rewritten coordinates — expression-tree growth Catalyst's project
    * collapse can re-inline into exponential form. Here it is one JIT'd
    * loop per row, fully inside WholeStageCodegen.
    */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.hilbert2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernels.hilbert2($a, $b, $bits)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
      copy(left = l, right = r)
    override def prettyName: String = "hilbert_index"
  }

  /** Shannon entropy (nats) of a string's code-point distribution in
    * micro-nat-quantized arithmetic ([[ExprKernels.charEntropy]] — the
    * [[graft.ops.LanguageModel]] determinism pattern). Native because the
    * declarative equivalent explodes one row per CHARACTER through a
    * (doc, char) shuffle; this is one JIT'd histogram pass per row.
    */
  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.charEntropy(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Kernels.charEntropy($c)")
    override protected def withNewChildInternal(c: Expression): CharEntropy = copy(child = c)
    override def prettyName: String = "char_entropy"
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
  /** Intersection of two ASCENDING-sorted array<long> columns
    * ([[ExprKernels.sortedIntersectLongs]], a two-pointer merge). Native
    * because the builtin `array_intersect` allocates a hash set per row —
    * at millions of closing-join probes that allocation dominated
    * [[graft.ops.Graph.triangleCounts]] and drove its GC jitter. Inputs
    * MUST be sorted ascending (the sort_array'd adjacency lists are);
    * the result is then value-identical to array_intersect.
    */
  case class SortedIntersect(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression): Boolean = e.dataType match {
        case ArrayType(LongType, _) => true
        case _                      => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> on both sides, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.sortedIntersectLongs(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernels.sortedIntersectLongs($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersect =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_intersect"
  }

  /** Exact set Jaccard over two ASCENDING-sorted distinct array<long>
    * columns in one fused two-pointer pass
    * ([[ExprKernels.sortedJaccardLongs]]) — value-identical to
    * size(array_intersect)/size(array_distinct(concat)) on the same
    * sets, without either builtin's per-row hash-set allocation (the
    * [[SortedIntersect]] rationale, applied to the millions-of-pairs
    * verify stage of the similarity joins).
    */
  case class SortedJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression): Boolean = e.dataType match {
        case ArrayType(LongType, _) => true
        case _                      => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> on both sides, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.sortedJaccardLongs(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Kernels.sortedJaccardLongs($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_jaccard"
  }

  /** Each byte of a binary column as a long array element — the unpack
    * of a packed register buffer ([[graft.functions.PackRegisters]])
    * back to the per-bucket row form [[Sketches.hllEstimate]] consumes.
    */
  case class BytesToLongArray(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case BinaryType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires binary, got ${other.catalogString}")
      }

    override def nullSafeEval(b: Any): Any =
      ExprKernels.bytesToLongs(b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"$Kernels.bytesToLongs($b)")
    override protected def withNewChildInternal(c: Expression): BytesToLongArray =
      copy(child = c)
    override def prettyName: String = "bytes_to_long_array"
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
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

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        leftFloat, rightFloat)

    // the result itself is nullable (length mismatch), so the generated
    // code re-checks the boxed return instead of using defineCodeGen
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("dotResult")
        s"""
           |java.lang.Double $tmp = $Kernels.dot($a, $b, $leftFloat, $rightFloat);
           |if ($tmp == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $tmp.doubleValue();
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product"
  }

  /** Banded DTW distance between two array<double> series
    * ([[ExprKernels.dtwBanded]]): null on empty inputs or when the
    * band admits no warping path (|n − m| > band).
    */
  case class DtwBanded(left: Expression, right: Expression, band: Int)
      extends BinaryExpression {
    require(band >= 0, s"band must be >= 0, got $band")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression): Boolean = e.dataType match {
        case ArrayType(DoubleType, _) => true
        case _                        => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> on both sides, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.dtwBanded(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], band)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("dtwResult")
        s"""
           |java.lang.Double $tmp = $Kernels.dtwBanded($a, $b, $band);
           |if ($tmp == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $tmp.doubleValue();
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DtwBanded =
      copy(left = l, right = r)
    override def prettyName: String = "dtw_banded"
  }

  case class SquaredL2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    // Reachable from SQL via the registered `squared_l2` function, so the
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

    override def nullSafeEval(a: Any, b: Any): Any =
      ExprKernels.sqL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        leftFloat, rightFloat)

    // the result itself is nullable (length mismatch), so the generated
    // code re-checks the boxed return instead of using defineCodeGen
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("sqL2Result")
        s"""
           |java.lang.Double $tmp = $Kernels.sqL2($a, $b, $leftFloat, $rightFloat);
           |if ($tmp == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $tmp.doubleValue();
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredL2 =
      copy(left = l, right = r)
    override def prettyName: String = "squared_l2"
  }

  /** Regularized incomplete beta I_x(a, b) — the F / Student-t p-value
    * kernel ([[PValues.ibetaReg]]: Lentz continued fraction, PINNED
    * iteration count, pinned Lanczos log-gamma). A native expression
    * because the fraction is SEQUENTIAL state — an unrolled Column tree
    * duplicates the state subtrees exponentially — and so in-plan
    * per-row p columns (segment-level F/t readouts) stay inside
    * WholeStageCodegen. eval and codegen both delegate to the SAME
    * driver kernel: bit-identical by construction.
    */
  case class IbetaReg(x: Expression, a: Expression, b: Expression)
      extends TernaryExpression {
    override def first: Expression = x
    override def second: Expression = a
    override def third: Expression = b
    override def dataType: DataType = DoubleType
    override def nullable: Boolean =
      x.nullable || a.nullable || b.nullable
    override protected def nullSafeEval(xv: Any, av: Any, bv: Any): Any =
      PValues.ibetaReg(xv.asInstanceOf[Double], av.asInstanceOf[Double],
        bv.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (xv, av, bv) =>
        s"graft.functions.PValues.ibetaReg($xv, $av, $bv)")
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): IbetaReg = copy(x = f, a = s, b = t)
    override def prettyName: String = "ibeta_reg"
  }

  /** Viterbi unigram-LM word segmentation under a FIXED piece-cost
    * table (Kudo 2018's apply step): string ->
    * struct(n_tokens long, cost6 long, pieces array<string>).
    * The vocab rides as a codegen reference object (it is model state,
    * not row data — a join would shuffle the corpus for a lookup table
    * that is vocab-bounded by construction), so the expression stays
    * inside WholeStageCodegen; eval and codegen delegate to the same
    * [[ExprKernels.unigramSegment]] kernel.
    */
  case class UnigramSegment(child: Expression,
      costs: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int, unkCost6: Long) extends UnaryExpression {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("cost6", LongType, nullable = false),
      StructField("pieces", ArrayType(StringType, containsNull = false),
        nullable = false)))
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.unigramSegment(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        costs, maxPieceLen, unkCost6)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramCosts", costs,
        "java.util.HashMap<String, Long>")
      defineCodeGen(ctx, ev,
        c => s"$Kernels.unigramSegment($c, $ref, $maxPieceLen, ${unkCost6}L)")
    }
    override protected def withNewChildInternal(nc: Expression): UnigramSegment =
      copy(child = nc)
    override def prettyName: String = "unigram_segment"
  }

  /** Greedy longest-match-first WordPiece word segmentation under a
    * FIXED piece set (Schuster & Nakajima 2012; BERT's apply step):
    * string -> struct(n_tokens long, is_unk boolean). Word-initial
    * spans look up as-is, continuations with the "##" prefix; an
    * unmatchable word is the single unknown token. The vocab rides as
    * a codegen reference object (model state, not row data — the
    * [[UnigramSegment]] convention), so the expression stays inside
    * WholeStageCodegen; eval and codegen delegate to the same
    * [[ExprKernels.wordpieceSegment]] kernel.
    */
  case class WordpieceSegment(child: Expression,
      vocab: java.util.HashSet[String], maxPieceLen: Int)
      extends UnaryExpression {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("is_unk", BooleanType, nullable = false)))
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      ExprKernels.wordpieceSegment(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        vocab, maxPieceLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wordpieceVocab", vocab,
        "java.util.HashSet<String>")
      defineCodeGen(ctx, ev,
        c => s"$Kernels.wordpieceSegment($c, $ref, $maxPieceLen)")
    }
    override protected def withNewChildInternal(nc: Expression): WordpieceSegment =
      copy(child = nc)
    override def prettyName: String = "wordpiece_segment"
  }
}

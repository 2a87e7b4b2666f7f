package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable dense-vector primitives over `array<float>` embedding
  * columns.
  *
  * All math is done in double precision with strictly sequential (left to
  * right) accumulation — `aggregate(zip_with(...))` in Spark,
  * `list_reduce(list_zip(...))`-equivalent in the DuckDB oracle — so both
  * engines produce bit-identical IEEE-754 results and the correctness gate
  * can hash-match similarity scores (rounded to 6 decimals for belt and
  * braces).
  *
  * Scale notes (100 TB): cosine/dot are per-row codegen'd expression trees
  * (no UDF, no shuffle). The ANN path never does an all-pairs join: the
  * sign-LSH banding in [[graft.ops.Similarity]] buckets vectors first, and
  * the brute-force path is only used with a small broadcast query set.
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Sequential double dot product of two float arrays. Native expression
    * ([[Expressions.DotProduct]]) — same left-to-right double accumulation
    * as the `aggregate(zip_with(...))` form, one JVM loop per row.
    */
  def dot(a: Column, b: Column): Column =
    toCol(Expressions.DotProduct(toExpr(a), toExpr(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Banded DTW distance between two array<double> series (Sakoe-Chiba
    * radius `band`); null when no path exists inside the band. Native
    * expression ([[Expressions.DtwBanded]]) — O(n·band) rolling DP, one
    * JVM loop per row.
    */
  def dtwBanded(a: Column, b: Column, band: Int): Column =
    toCol(Expressions.DtwBanded(toExpr(a), toExpr(b), band))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** `nBits` sign bits of the embedding against the fixed hyperplane family,
    * as an array<long> of 0/1. Bit j = [ sum_d emb[d]*plane(j,d) >= 0 ].
    * Random-hyperplane LSH: P(bit match) = 1 - angle/pi (Charikar 2002).
    * Native expression ([[Expressions.SignBits]]), same arithmetic as the
    * declarative `transform(sequence(...), j -> aggregate(zip_with(...)))`
    * form it replaces.
    */
  def signBits(emb: Column, nBits: Int): Column =
    toCol(Expressions.SignBits(toExpr(emb), nBits))

  /** Band the sign bits into `b` bands of `r` bits, keyed by joined string —
    * same shape as [[TextFunctions.bands]]; vectors sharing (band, bsig) are
    * ANN candidates. Recall for cosine c: 1-(1-p^r)^b with p = 1 - acos(c)/pi.
    */
  def bitBands(bits: Column, b: Int, r: Int): Column =
    TextFunctions.bands(bits, b, r) // one banding encoding for text AND vectors

  /** Pack an array<long> of 0/1 bits into one signed 64-bit Hamming code
    * (LSB-first, <= 64 bits). `packBits(signBits(emb, 64))` is the 8-byte
    * binary quantization of an embedding row — 32x smaller than 64 floats.
    */
  def packBits(bits: Column): Column =
    toCol(Expressions.PackBits(toExpr(bits)))

  /** Hamming distance between two packed bit codes: `bit_count(a ^ b)` —
    * Spark built-ins only, fully codegen'd.
    */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text fingerprinting primitives.
  *
  * Every function here is built from codegen'd Spark SQL built-ins (no UDFs,
  * no Scala closures on the hot path) AND is expressible with identical
  * arithmetic in ANSI-ish SQL, so the DuckDB oracle can replay the exact
  * computation. That is the determinism contract for the correctness gate:
  * base hash = first 8 hex chars of md5 (same bytes in any engine), then
  * pure integer arithmetic mod a 31-bit prime (no overflow in a signed 64-bit
  * lane: operands < 2^30, products < 2^60).
  *
  * Scale notes (100 TB): everything is per-row narrow work — shingling,
  * hashing and signatures stay inside whole-stage codegen with no shuffle;
  * the only shuffles in the dedup operators built on top are the
  * band-bucket groupBy/self-join (small: one row per (doc, band)) — never an
  * all-pairs cross join. (ref: reference delegates all text processing to
  * Spark SQL through its view contract, SURVEY §2.2; these primitives are the
  * north-star extension surface, SURVEY §2.3.)
  */
object TextFunctions {

  /** 31-bit prime modulus for all hash arithmetic. */
  val P = 1000000007L

  /** Stable 32-bit-ish hash of a string: first 8 hex chars of md5, mod P.
    * Portable: `('0x'||substr(md5(s),1,8))::BIGINT % P` in DuckDB.
    */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % P

  /** Raw 32-bit hash (first 8 hex chars of md5, NO modulus): exactly
    * uniform over [0, 2^32), unlike [[h32]] whose `% P` fold makes values
    * below 2^32−4P ≈ 2.95e8 25% likelier. Use this domain whenever a
    * threshold must realize an exact Bernoulli(rate) draw (e.g. permutation
    * relabeling): compare against `floor(rate · 2^32)`.
    * Portable: `('0x'||substr(md5(s),1,8))::BIGINT` in DuckDB.
    */
  def h32raw(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace words (single-space separated in the corpus). */
  def words(c: Column): Column = split(c, " ")

  /** Distinct word n-gram shingles; whole text as the single shingle when
    * the doc is shorter than n words (so every doc has >=1 shingle and
    * MinHash is total).
    *
    * IMPORTANT perf contract: pass `ws` as a MATERIALIZED column (its own
    * projection), not the inline `split(...)` expression. Higher-order
    * functions are interpreted, not codegen'd, and re-evaluate their child
    * on every lambda invocation — an inline split makes shingling O(words²)
    * in string work. `ws` is referenced several times here, which also
    * stops Catalyst's CollapseProject from inlining the producing split.
    */
  def wordShingles(ws: Column, text: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(ws) - lit(n - 1)),
      i => array_join(slice(ws, i, lit(n)), " "))
    when(size(ws) >= n, array_distinct(grams))
      .otherwise(array(text))
  }

  /** Convenience form computing the split inline — fine for one-off scalar
    * use; hot paths should use the (ws, text, n) overload (see above).
    */
  def wordShingles(c: Column, n: Int): Column = wordShingles(words(c), c, n)

  /** Distinct character n-gram shingles (whole text fallback when shorter). */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) >= n,
      array_distinct(transform(
        sequence(lit(1), length(c) - lit(n - 1)),
        i => c.substr(i, lit(n)))))
      .otherwise(array(c))

  /** Hash every shingle to [0, P). */
  def shingleHashes(shingles: Column): Column = transform(shingles, h32(_))

  /** Distinct hashed word n-gram shingles straight from text — the fused
    * native form of words -> wordShingles -> shingleHashes -> distinct
    * ([[Expressions.HashedWordNgrams]]); one JVM loop per row.
    */
  def hashedWordNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.HashedWordNgrams(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Positional hashed word n-grams (ordered, duplicates kept) — the
    * span/run-analysis sibling of [[hashedWordNgrams]].
    */
  def hashedWordNgramSeq(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.HashedWordNgramSeq(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Distinct hashed character n-gram shingles winnowed to hashes ≡ 0
    * (mod sampleMod) — fused native charShingles -> h32 -> distinct ->
    * mod-filter ([[Expressions.HashedCharNgrams]]).
    */
  def hashedCharNgrams(text: Column, n: Int, sampleMod: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.HashedCharNgrams(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n, sampleMod))

  /** k-permutation MinHash signature over pre-hashed shingles.
    * Permutation i: h -> (a_i*h + b_i) mod P with
    * a_i = ((i+1)*2654435761) mod P, b_i = ((i+1)*40503) mod P — Knuth
    * multiplicative constants, fixed so any engine reproduces the signature
    * bit-for-bit. min() is order-independent, so distinct-list ordering
    * differences between engines cannot matter.
    *
    * Runs as a native Catalyst expression ([[Expressions.MinHashSig]]) —
    * one primitive JVM loop per row; the declarative HOF formulation
    * (`transform(sequence(0,k-1), i -> array_min(transform(hashes, ...)))`)
    * computes the identical values but is interpreted per element and
    * measured ~60x slower.
    */
  def minhashSig(hashes: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.MinHashSig(
        org.apache.spark.sql.GraftColumnBridge.expression(hashes), k))

  /** One-Permutation MinHash with rotation densification: ONE pass over
    * the shingle hashes (bucket h mod k, min per bucket, empty buckets
    * borrow clockwise) vs [[minhashSig]]'s k permutations — the k×
    * cheaper signature for long documents.
    */
  def ophSig(hashes: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.OphSig(
        org.apache.spark.sql.GraftColumnBridge.expression(hashes), k))

  /** LSH banding: split a k-length signature into `b` bands of `r` rows and
    * key each band by its joined-string signature. Returns
    * array<struct<band:int, bsig:string>> ready to explode; docs sharing
    * (band, bsig) are LSH candidates. S-curve threshold ~ (1/b)^(1/r).
    */
  def bands(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), j =>
      struct(
        j.cast("int").as("band"),
        array_join(transform(slice(sig, j * r + 1, lit(r)), _.cast("string")), "-")
          .as("bsig")))

  /** Exact set Jaccard |A∩B| / |A∪B| over (already distinct) shingle arrays.
    * Integer counts + one double division: engine-exact.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** [[jaccard]] over ASCENDING-sorted distinct arrays via the fused
    * one-pass kernel ([[Expressions.SortedJaccard]]) — value-identical,
    * no per-pair hash-set allocation. Inputs MUST be sorted ascending
    * (sort_array the shingle column once per document, not per pair).
    */
  def sortedJaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.SortedJaccard(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Code-point Shannon entropy (nats, 6dp) — native codegen'd expression
    * ([[Expressions.CharEntropy]]) with the micro-nat determinism
    * contract; one histogram pass per row, no per-character explode.
    */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.CharEntropy(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Jaro-Winkler similarity — native codegen'd expression
    * ([[Expressions.JaroWinklerSim]]) with rapidfuzz/DuckDB semantics
    * (prefix boost only above jaro 0.7, prefix capped at 4).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.JaroWinklerSim(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** 60-bit word hashes for SimHash: first 15 hex chars of md5 (60 bits —
    * the widest width where the fingerprint AND every 2^j used in the
    * banded oracle replay stay inside a signed 64-bit lane in both
    * engines), over the distinct words. Materialize this as its own column
    * before calling [[simhash60FromHashes]] so the md5 pass runs once per
    * row, not once per bit position.
    */
  def wordHashes60(ws: Column): Column =
    transform(array_distinct(ws),
      w => conv(substring(md5(w), 1, 15), 16, 10).cast("long"))

  /** 60-bit SimHash from precomputed word hashes. Bit j of the fingerprint
    * is set when at least half the words have bit j set (sum of ±1 votes
    * >= 0). Near-dup docs differ in few bits (Hamming). Native expression
    * ([[Expressions.SimHashBits]]); (h >> j) & 1 there is identical to the
    * engine-portable floor(h / 2^j) % 2 the oracle uses, h being >= 0.
    *
    * 60 bits (not 48) so Hamming-band keys are 15 bits wide at
    * maxHamming=3 — 32768 distinct keys per band, 8x the key space of the
    * 12-bit-band design this replaces (see [[graft.ops.Dedup.simhashPairs]]
    * for the oversized-bucket splitter that handles the residual skew).
    */
  def simhash60FromHashes(wh: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Expressions.SimHashBits(
        org.apache.spark.sql.GraftColumnBridge.expression(wh), 60))

  /** One-shot SimHash from raw text (hot paths should stage
    * [[wordHashes60]] in its own projection first).
    */
  def simhash60(c: Column): Column = simhash60FromHashes(wordHashes60(words(c)))

  /** Rolling polynomial fingerprint of the full text:
    * acc <- (acc*31 + codepoint(ch)) mod P over characters in order.
    * Identical in DuckDB via list_reduce over string_split(text,'').
    */
  def fingerprint(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % P)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The hash/sketch inner loops behind [[Expressions]], as STATIC methods.
  *
  * Why a separate object: whole-stage codegen emits Java that can only
  * call static-forwardable methods. Keeping the loop bodies here lets
  * each Catalyst expression implement `doGenCode` as a one-line call —
  * so the surrounding Project/Filter stays INSIDE WholeStageCodegen
  * (a CodegenFallback expression evicts the whole stage, boxing every
  * row through the interpreted path) — while `nullSafeEval` delegates to
  * the same code, guaranteeing the interpreted and generated paths are
  * bit-identical by construction.
  */
object ExprKernels {

  val P = 1000000007L

  private val threadMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars of the utf8 bytes as an unsigned 32-bit value,
    * mod P — identical to `conv(substring(md5(s),1,8),16,10) % P` and to
    * DuckDB's `('0x'||substr(md5(s),1,8))::BIGINT % P`.
    */
  def md5h32(bytes: Array[Byte]): Long = {
    val d = threadMd5.get()
    d.reset()
    val h = d.digest(bytes)
    (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16)
      | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % P
  }

  /** `passes` sequential applications of a literal replace table
    * (flattened [m0, r0, m1, r1, …], applied in order within each
    * pass). Semantically identical to nesting `replace(…)` table.size ×
    * passes deep — Java's String.replace is the same literal,
    * non-overlapping, left-to-right substitution as SQL replace — but
    * without the Column-tree depth (a 105-entry depth-2 mojibake chain
    * overflows the analyzer stack as nested Columns).
    */
  def chainReplace(s: UTF8String, table: Array[String],
      passes: Int): UTF8String = {
    var str = s.toString
    var p = 0
    while (p < passes) {
      var i = 0
      while (i < table.length) {
        str = str.replace(table(i), table(i + 1))
        i += 2
      }
      p += 1
    }
    UTF8String.fromString(str)
  }

  /** Unicode NFC (canonical composition). Fast path: JDK's
    * `isNormalized` is a cheap quick-check scan for ASCII/already-
    * composed text (the overwhelming majority of any real corpus), so
    * the allocation-heavy normalize only runs on rows that need it.
    * Agrees codepoint-for-codepoint with DuckDB's `nfc_normalize`
    * (both implement UAX #15 NFC; verified over the fixture domain in
    * the text_nfc gate).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val minhashCoef =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** k-permutation MinHash over an array<long> of shingle hashes in [0,P). */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val (as, bs) = minhashCoef.computeIfAbsent(k, kk =>
      (Array.tabulate(kk)(i => (i + 1) * 2654435761L % P),
        Array.tabulate(kk)(i => (i + 1) * 40503L % P)))
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

  // plane(j, d) depends on the vector dimension; cache per (nBits, dim).
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nBits.toLong << 32) | dim, _ =>
      Array.tabulate(nBits, dim)((j, k) =>
        ((j.toLong * dim + k) * 2654435761L % 97 - 48).toDouble))

  /** Sign-LSH bits of an array<float> embedding against the fixed
    * deterministic hyperplane family. Returns array<long> of 0/1.
    */
  def signBits(emb: ArrayData, nBits: Int): ArrayData = {
    val dim = emb.numElements()
    val pl = planes(nBits, dim)
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

  /** One-Permutation MinHash signature with rotation densification
    * (Li, Owen & Zhang 2012; Shrivastava & Li 2014): shingle hash h lands
    * in bucket h mod k, each bucket keeps its min, and an EMPTY bucket j
    * borrows the nearest non-empty bucket clockwise ((j+1, j+2, ...) mod
    * k). ONE pass over the shingles instead of k permutations — the k×
    * cheaper signature for long documents, at mildly higher estimator
    * variance (pairs are exact-Jaccard verified downstream anyway, so
    * only candidate recall is affected). Deterministic and order-free:
    * bucket mins are order-insensitive and the borrow scan is a pure
    * function of which buckets are occupied.
    */
  def ophSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](k)
    if (n == 0) return new GenericArrayData(out)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, -1L)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      val b = (h % k).toInt
      if (sig(b) < 0 || h < sig(b)) sig(b) = h
      i += 1
    }
    var j = 0
    while (j < k) {
      if (sig(j) >= 0) out(j) = sig(j)
      else {
        var t = 1
        while (sig((j + t) % k) < 0) t += 1 // n >= 1 => terminates
        out(j) = sig((j + t) % k)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Pack an array<long> of 0/1 bits (bit j -> position j, LSB-first)
    * into one signed 64-bit code. Up to 64 bits; bit 63 lands in the sign
    * bit, which XOR/popcount treat like any other lane, so the packed
    * value is a pure Hamming code, never an arithmetic quantity.
    */
  def packBits(bits: ArrayData): Long = {
    val n = bits.numElements()
    require(n <= 64, s"packBits: at most 64 bits fit one long, got $n")
    var acc = 0L
    var j = 0
    while (j < n) {
      if (bits.getLong(j) != 0L) acc |= 1L << j
      j += 1
    }
    acc
  }

  /** `nBits`-bit SimHash from an array<long> of word hashes. */
  def simhashBits(hs: ArrayData, nBits: Int): Long = {
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
    acc
  }

  /** Distinct hashed word n-gram shingles (whole-text fallback below n
    * words). Split on a single space with trailing empties kept.
    */
  def hashedWordNgrams(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
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
    toLongArray(out)
  }

  /** POSITIONAL hashed word n-grams: one hash per starting position, in
    * order, duplicates kept — [[hashedWordNgrams]] without the distinct
    * (that one feeds set algebra; this one feeds span/run analysis where
    * position matters). Same fallback: below n words, the whole text as
    * one gram.
    */
  def hashedWordNgramSeq(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    val words = text.split(" ", -1)
    if (words.length >= n) {
      val out = new Array[Long](words.length - n + 1)
      var i = 0
      while (i <= words.length - n) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        out(i) = md5h32(sb.toString.getBytes("UTF-8"))
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array(md5h32(text.getBytes("UTF-8"))))
  }

  /** Distinct hashed character n-gram shingles, winnowed to hashes ≡ 0
    * (mod sampleMod). Substrings are by Unicode code point.
    */
  def hashedCharNgrams(input: UTF8String, n: Int, sampleMod: Int): ArrayData = {
    val text = input.toString
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
    toLongArray(out)
  }

  private def toLongArray(out: java.util.LinkedHashSet[java.lang.Long]): ArrayData = {
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Jaro-Winkler similarity in [0,1] — rapidfuzz/DuckDB-compatible:
    * match window floor(max(l1,l2)/2)-1 (min 0), transpositions =
    * mismatched-match-positions / 2 (integer), jaro = (m/l1 + m/l2 +
    * (m-t)/m)/3, and the Winkler prefix boost (common prefix capped at
    * 4, weight 0.1) applied ONLY when jaro > 0.7. Comparison is by
    * UTF-16 unit, which equals DuckDB's byte comparison on ASCII text;
    * both-empty = 1, one-empty = 0.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    // Matching phase. The naive form scans the full ±window per s1 char —
    // O(l1·window), and window ≈ len/2 makes long-text JW quadratic (the
    // 27 s dedup_jarowinkler block join was >95% inside this loop). For
    // Latin-1 text we index s2's positions per char (counting sort) and
    // keep one cursor per char: the window's LOWER bound only ever
    // advances, so a position is skipped permanently only when expired or
    // consumed — each s2 position is visited O(1) amortized, total
    // O(l1+l2). Semantics are IDENTICAL to the naive scan (both take the
    // smallest unused in-window position of the char; the property spec
    // pins them equal), which keeps DuckDB's jaro_winkler_similarity as
    // the oracle replay. Non-Latin-1 input falls back to the naive loop.
    // Indexing pays for its setup (three 256-int tables + the position
    // array) only once the naive scan's l1·window work dwarfs it — on
    // short strings (record-linkage names) the naive loop wins, measured
    // 10.5 s vs 7 s on linkage_score when indexing unconditionally.
    var latin1 = l1 + l2 >= 96
    var sc = 0
    while (latin1 && sc < l2) { if (s2.charAt(sc) >= 256) latin1 = false; sc += 1 }
    sc = 0
    while (latin1 && sc < l1) { if (s1.charAt(sc) >= 256) latin1 = false; sc += 1 }
    if (latin1) {
      val cnt = new Array[Int](257)
      var j = 0
      while (j < l2) { cnt(s2.charAt(j) + 1) += 1; j += 1 }
      var c = 0
      while (c < 256) { cnt(c + 1) += cnt(c); c += 1 }
      val off = java.util.Arrays.copyOf(cnt, 256) // start offset per char
      val pos = new Array[Int](l2)
      j = 0
      while (j < l2) {
        val ch = s2.charAt(j)
        pos(cnt(ch)) = j; cnt(ch) += 1
        j += 1
      }
      val end = cnt // now end offset per char
      val cur = java.util.Arrays.copyOf(off, 256) // per-char cursor
      var i = 0
      while (i < l1) {
        val ch = s1.charAt(i)
        if (ch < 256) {
          val lo = i - window
          val hi = math.min(l2 - 1, i + window)
          var k = cur(ch)
          // skip expired positions for good: lo is monotone in i
          while (k < end(ch) && pos(k) < lo) k += 1
          cur(ch) = k
          if (k < end(ch) && pos(k) <= hi) {
            m1(i) = true; m2(pos(k)) = true; matches += 1
            cur(ch) = k + 1
          }
        }
        i += 1
      }
    } else {
      var i = 0
      while (i < l1) {
        val c = s1.charAt(i)
        var j = math.max(0, i - window)
        val hi = math.min(l2 - 1, i + window)
        var found = false
        while (j <= hi && !found) {
          if (!m2(j) && c == s2.charAt(j)) {
            m1(i) = true; m2(j) = true; matches += 1; found = true
          }
          j += 1
        }
        i += 1
      }
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    var i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val t = half / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** Intersection of two ASCENDING-sorted long arrays by two-pointer
    * merge — O(|a|+|b|), no per-row hash set. The `array_intersect`
    * replacement for the triangle-closing join, where both adjacency
    * lists arrive sorted by construction: the builtin builds (and GCs) a
    * hash set per ROW, which at millions of edges × ~50-element arrays
    * made allocation the dominant cost (and the run-to-run jitter).
    * Result order is ascending, same as array_intersect on sorted
    * distinct inputs — the replacement is value-identical.
    */
  def sortedIntersectLongs(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  /** Exact Jaccard |A∩B| / |A∪B| over ASCENDING-sorted DISTINCT
    * array<long> sets in ONE two-pointer pass — no per-pair hash set, no
    * intermediate array (|A∪B| = na + nb − inter). Two empty sets yield
    * 0/0 = NaN, matching the size(array_intersect)/size(array_distinct)
    * formulation this replaces value-for-value.
    */
  def sortedJaccardLongs(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { inter += 1; i += 1; j += 1 }
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Each byte of `bytes` as a long — the unpack of a packed register
    * buffer back to per-bucket values (rho bytes are small non-negative,
    * so a signed widen is exact).
    */
  def bytesToLongs(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit average-hash (aHash) perceptual fingerprint of a binary
    * payload: bytes fold into 60 strided buckets (position mod 60), and
    * bit j is set when bucket j's AVERAGE is >= the global average —
    * compared by exact integer cross-multiplication
    * (sum_j·len >= total·count_j), so any engine replays it bit-for-bit.
    * 60 bits (not 64) keeps the fingerprint and every 2^j inside a
    * signed 64-bit lane on replay engines — the SimHash convention, and
    * what lets [[graft.ops.Dedup.fingerprintPairs]] band it unchanged.
    * With a real codec the buckets are 8x8 downsampled luma pixels; the
    * stand-in folds raw payload bytes the same way the fake decoder
    * derives its features. Empty payload → 0.
    */
  def perceptualHash60(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    val sums = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < len) {
      val v = (payload(i) & 0xff).toLong
      sums(i % 60) += v
      total += v
      i += 1
    }
    val base = len / 60
    val rem = len % 60
    var acc = 0L
    var j = 0
    while (j < 60) {
      val cnt = base + (if (j < rem) 1 else 0)
      if (cnt > 0 && sums(j) * len >= total * cnt) acc += 1L << j
      j += 1
    }
    acc
  }

  /** 2-D Hilbert curve index of (x, y) on a 2^bits × 2^bits grid — the
    * classic xy→d walk (Hilbert 1891; iterative form per Warren, Hacker's
    * Delight §16): per level, take the quadrant, then flip/transpose the
    * frame so the sub-curve enters where the parent left off. Pure
    * integer shifts/flips — engine-replayable (the DuckDB oracle chains
    * one CTE per level with identical CASE arithmetic).
    *
    * Locality: successive d values are ALWAYS unit grid steps (asserted
    * exhaustively in LayoutSpec), unlike Z-order whose bit-carry seams
    * teleport across the grid — so equal-size blocks of a
    * Hilbert-sorted table get strictly tighter min-max boxes. Inputs are
    * masked to the low `bits` bits (same silent-degrade domain contract
    * as zValueN: out-of-range keys fold, the layout degrades, never
    * corrupts).
    */
  def hilbert2(x: Long, y: Long, bits: Int): Long = {
    val n = 1L << bits
    var hx = x & (n - 1)
    var hy = y & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((hx & s) != 0) 1L else 0L
      val ry = if ((hy & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // flip (lower-left / lower-right quadrants), then transpose
        if (rx == 1L) { hx = n - 1 - hx; hy = n - 1 - hy }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  /** N-dimensional Hilbert index via Skilling's transpose algorithm
    * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): the
    * inverse-undo pass (per level, invert-or-exchange each axis against
    * axis 0), Gray encoding across axes, the trailing-axis correction,
    * then MSB-first interleave of the transposed bits. Pure integer
    * xors/shifts — replayed in the DuckDB oracle as one CTE per
    * sequential step (the in-place mutations make step order part of the
    * contract). Inputs masked to `bits` (the [[hilbert2]]/zValueN
    * silent-degrade domain contract); n·bits <= 62 keeps the index in a
    * signed 64-bit lane.
    *
    * NOTE: this is a different (equally valid) Hilbert orientation than
    * the 2-D walk in [[hilbert2]] — both have the defining unit-step
    * property (asserted exhaustively in LayoutSpec), they just traverse
    * mirrored variants; the 2-D gate stays on hilbert2.
    */
  def hilbertN(coords: ArrayData, bits: Int): Long = {
    val n = coords.numElements()
    val mask = (1L << bits) - 1
    val X = new Array[Long](n)
    var i = 0
    while (i < n) { X(i) = coords.getLong(i) & mask; i += 1 }
    val M = 1L << (bits - 1)
    var Q = M
    while (Q > 1) { // inverse undo
      val P = Q - 1
      i = 0
      while (i < n) {
        if ((X(i) & Q) != 0) X(0) ^= P // invert
        else { val t = (X(0) ^ X(i)) & P; X(0) ^= t; X(i) ^= t } // exchange
        i += 1
      }
      Q >>= 1
    }
    i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 } // Gray encode
    var t = 0L
    Q = M
    while (Q > 1) { if ((X(n - 1) & Q) != 0) t ^= Q - 1; Q >>= 1 }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // interleave transposed bits, MSB-first across axes
    var d = 0L
    var q = bits - 1
    while (q >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((X(i) >> q) & 1L); i += 1 }
      q -= 1
    }
    d
  }

  /** Shannon entropy (nats) of the code-point distribution of a string,
    * in engine-exact micro-nat arithmetic: with n code points and per-
    * code-point counts c, entropy = round(-Σ c·round6dp-free, see below.
    *
    * Contract (replayed verbatim by the DuckDB oracle):
    *   micro  = Σ_c c · sparkRound0(ln(c/n)·1e6)   — LONG sum, any order
    *   result = sparkRound6(-micro / 1e6 / n) + 0.0
    * where sparkRoundS is Spark `round(x, s)` bit-for-bit: shortest-
    * decimal (Double.toString / BigDecimal.valueOf) then HALF_UP —
    * matching DuckDB `round` on everything the gates exercise.
    * Quantizing each ln to integer micro-nats
    * BEFORE summing makes the sum exact long arithmetic — the same
    * last-ulp-proofing as [[graft.ops.LanguageModel]]'s bigram scorer.
    * Empty string → 0.0. One JVM pass per row; the declarative form
    * would explode one row per CHARACTER (corpus × avg-length rows
    * through a shuffle — the kind of blow-up a 100 TB scan cannot pay).
    */
  def charEntropy(input: UTF8String): Double = {
    val text = input.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var micro = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      // Math.log, not StrictMath: bit-parity with Spark's `log()` (the
      // declarative spec in ExpressionsPropertySpec and the LanguageModel
      // precedent the DuckDB oracle already matches)
      val x = Math.log(c.toDouble / n) * 1e6
      // Spark's round() semantics EXACTLY: scala BigDecimal(double) goes
      // through Double.toString (shortest decimal), then HALF_UP — the
      // exact-binary `new BigDecimal(double)` disagrees whenever the
      // shortest decimal reads ...5 but the binary value sits a hair
      // below (e.g. micro/1e6/n = 2.6622475). java BigDecimal.valueOf is
      // the same toString-based constructor.
      micro += c * java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    val raw = -micro.toDouble / 1e6 / n
    java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
  }

  /** Sequential-double dot product; null (boxed) on length mismatch. */
  def dot(x: ArrayData, y: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean): java.lang.Double = {
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

  /** Squared L2 distance with [[dot]]'s exact accumulation contract:
    * sequential left-to-right sum of (x_i - y_i)^2 — bit-identical to
    * the zip_with/aggregate fold it replaces (the PQ hot path evaluates
    * it corpus x subspaces x K times; interpreted higher-order
    * functions there cost ~2 s per pass at sf0.1, the kernel is free).
    */
  def sqL2(x: ArrayData, y: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      val xe = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val ye = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xe - ye
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Banded dynamic-time-warping distance between two double series
    * (Sakoe & Chiba 1978): D(i,j) = |x_i − y_j| + min(D(i−1,j),
    * D(i,j−1), D(i−1,j−1)) restricted to |i−j| <= band, D(0,0) = 0,
    * borders +inf. Rolling two-row DP — O(min(n,m)·band) time, O(m)
    * space, one JVM loop per row pair. Every cell is |diff| + a min of
    * already-identical doubles, so the result is bit-identical under
    * ANY evaluation order — the anti-diagonal DuckDB replay produces
    * the same bits. Returns null (boxed) when either series is empty
    * or |n − m| > band (no warping path exists inside the band).
    */
  def dtwBanded(x: ArrayData, y: ArrayData, band: Int): java.lang.Double = {
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0 || math.abs(n - m) > band) return null
    val INF = Double.PositiveInfinity
    var prev = new Array[Double](m + 1)
    var cur = new Array[Double](m + 1)
    java.util.Arrays.fill(prev, INF)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      val jLo = math.max(1, i - band)
      val jHi = math.min(m, i + band)
      var j = jLo
      while (j <= jHi) {
        val c = math.abs(x.getDouble(i - 1) - y.getDouble(j - 1))
        var best = prev(j) // D(i-1, j)
        if (prev(j - 1) < best) best = prev(j - 1) // D(i-1, j-1)
        if (cur(j - 1) < best) best = cur(j - 1) // D(i, j-1)
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      prev(0) = INF // D(i, 0) = inf for every i >= 1
      i += 1
    }
    val r = prev(m)
    if (java.lang.Double.isInfinite(r)) null else java.lang.Double.valueOf(r)
  }

  /** Viterbi unigram-LM segmentation of one word (Kudo 2018's apply
    * step, hard-EM E-step in [[graft.ops.Unigram]]): DP over character
    * positions with state = pathCost6 * 1024 + nTokens (cost dominates,
    * then fewer tokens), candidate pieces up to `maxPieceLen` chars
    * looked up in `costs` (piece -> cost6 = round(-ln p * 1e6) >= 0);
    * an unknown SINGLE character costs the pinned `unkCost6`. TIE RULE
    * (the oracle replays it): among equal states the SMALLEST previous
    * position wins — i.e. the longest final piece.
    *
    * Returns (nTokens: Long, cost6: Long, pieces: array<string>); the
    * empty word segments to (0, 0, []).
    */
  def unigramSegment(w: UTF8String,
      costs: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int, unkCost6: Long): InternalRow = {
    val s = w.toString
    val L = s.length
    if (L == 0)
      return new GenericInternalRow(Array[Any](0L, 0L,
        new GenericArrayData(Array.empty[Any])))
    val state = Array.fill(L + 1)(Long.MaxValue)
    val back = Array.fill(L + 1)(-1)
    state(0) = 0L
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (state(j) != Long.MaxValue) {
          val c = costs.get(s.substring(j, i))
          val pc: Long =
            if (c != null) c.longValue
            else if (i - j == 1) unkCost6
            else -1L
          if (pc >= 0L) {
            val cand = state(j) + pc * 1024L + 1L
            // strict <: the first (smallest) j achieving the min wins
            if (cand < state(i)) { state(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = L
    while (p > 0) {
      val j = back(p)
      pieces += UTF8String.fromString(s.substring(j, p))
      p = j
    }
    val arr = pieces.reverse.toArray
    new GenericInternalRow(Array[Any](state(L) % 1024L, state(L) / 1024L,
      new GenericArrayData(arr)))
  }

  /** Greedy longest-match-first WordPiece segmentation of one word
    * (Schuster & Nakajima 2012 — the BERT tokenizer's apply step, also
    * called "maximum munch"): from the current position take the
    * LONGEST piece whose raw span is at most `maxPieceLen` characters
    * and which is present in `vocab` — word-initial spans match as-is,
    * continuation spans match with the "##" prefix; if NO span
    * matches, the whole word becomes the single unknown token (the
    * BERT convention — no partial emission). Returns
    * (nTokens: Long, isUnk: Boolean); the empty word is (0, false).
    */
  def wordpieceSegment(w: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int): InternalRow = {
    val s = w.toString
    val L = s.length
    if (L == 0) return new GenericInternalRow(
      Array[Any](0L, java.lang.Boolean.FALSE))
    var pos = 0
    var tokens = 0L
    while (pos < L) {
      var k = math.min(maxPieceLen, L - pos)
      var matched = -1
      while (k >= 1 && matched < 0) {
        val raw = s.substring(pos, pos + k)
        val piece = if (pos == 0) raw else "##" + raw
        if (vocab.contains(piece)) matched = k
        k -= 1
      }
      if (matched < 0)
        return new GenericInternalRow(
          Array[Any](1L, java.lang.Boolean.TRUE))
      tokens += 1L
      pos += matched
    }
    new GenericInternalRow(Array[Any](tokens, java.lang.Boolean.FALSE))
  }
}

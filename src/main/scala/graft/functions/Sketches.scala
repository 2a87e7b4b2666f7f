package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketching.
  *
  * Spark's `approx_count_distinct` (HyperLogLog++) is the production
  * default, but its estimates are engine-specific — useless under a
  * cross-engine exactness gate. KMV (k-minimum-values, Bar-Yossef et al.
  * 2002) is the deterministic alternative: hash every value, keep the k
  * smallest distinct hashes; if fewer than k exist the count is exact,
  * otherwise estimate (k-1) * D / h_k with D the hash domain and h_k the
  * k-th smallest hash. Same md5-derived h32 as everything else, so any
  * engine reproduces the estimate bit-for-bit.
  *
  * Scale shape: distinct-of-hashes is one shuffle on a long; the k-smallest
  * selection is Spark's TakeOrderedAndProject (per-partition top-k, then a
  * k-row merge on the driver) — no global sort materializes.
  */
object Sketches {

  import TextFunctions.{P, h32}

  /** (exact_distinct, kmv_estimate) for `valueCol`, as one-row DataFrame.
    * The exact count rides along to make the estimate auditable.
    */
  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val hashes = df.select(h32(valueCol.cast("string")).as("h")).distinct()
    val smallest = hashes.orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
    val exact = df.select(valueCol.as("v")).distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    exact.crossJoin(smallest).select(
      col("exact_distinct"),
      when(col("n") < k, col("n").cast("double"))
        .otherwise(round(lit((k - 1).toDouble) * P / col("hk"), 4))
        .as("kmv_estimate"))
  }

  /** Per-shard KMV sketch: the k smallest distinct h32 values seen in the
    * shard — the MERGEABLE representation behind [[kmvDistinct]] (k longs
    * per shard, the whole sketch fits in one broadcast row set).
    */
  def kmvSketch(df: DataFrame, valueCol: Column, k: Int): DataFrame =
    df.select(h32(valueCol.cast("string")).as("h")).distinct()
      .orderBy(col("h")).limit(k)

  /** Merge per-shard KMV sketches and estimate: union the sketches,
    * dedup, take the k smallest — EXACTLY the whole-corpus sketch when
    * the shards partition the data (the k smallest of a union of
    * per-shard k-smallest sets is the global k-smallest), so incremental
    * per-shard sketching loses nothing. Shuffle cost: shards × k rows,
    * never data.
    */
  def kmvMergeEstimate(sketches: Seq[DataFrame], k: Int): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _).distinct()
      .orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
      .select(
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("hk"), 4))
          .as("kmv_estimate"))
  }

  /** KMV Jaccard similarity of two corpora's key sets — the bottom-k
    * coordinated-sample estimator: the k smallest hashes of A∪B are a
    * uniform sample of the union (the hash IS the sampling order), so the
    * fraction of them present in both A's and B's sketches estimates
    * |A∩B|/|A∪B|. Complements [[hllIntersectEstimate]]: KMV gives a
    * bounded-relative-error JACCARD directly (no inclusion-exclusion
    * cancellation), HLL gives absolute overlap cardinality.
    *
    * Everything is exact-deterministic given the shared h32 hash: both
    * engines compute identical sketches, so the gate hash-matches rather
    * than banding. Cost: two corpus scans reduced to k-row sketches; the
    * union/semi-join arithmetic touches <= 3k rows total regardless of
    * corpus size — corpus overlap for KBs of state, like the HLL path.
    *
    * Output: (n_union, n_match, kmv_jaccard 6dp) — n_union = |bottom-k of
    * the union| (< k only when the union itself is smaller than k, where
    * the estimate becomes exact).
    */
  def kmvJaccard(a: DataFrame, aCol: Column, b: DataFrame, bCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sa = kmvSketch(a, aCol, k)
    val sb = kmvSketch(b, bCol, k)
    val u = sa.unionByName(sb).distinct().orderBy(col("h")).limit(k)
    u.join(sa, Seq("h"), "left_semi").join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_match"))
      .crossJoin(broadcast(u.agg(count(lit(1)).as("n_union"))))
      .select(col("n_union"), col("n_match"),
        round(col("n_match").cast("double") / col("n_union").cast("double"), 6)
          .as("kmv_jaccard"))
  }

  /** KMV set-DIFFERENCE estimate |A \ B| — the same bottom-k
    * coordinated sample as [[kmvJaccard]]: the union's bottom-k is a
    * uniform sample of A∪B, so the fraction of it present in A's sketch
    * but absent from B's estimates |A\B| / |A∪B|; multiplied by the
    * union-cardinality estimate ((k−1)·P/h_k, the [[kmvMergeEstimate]]
    * formula) it yields the difference cardinality. The "how much NEW
    * data did this ingest bring" / "how much of A is not covered by B"
    * audit at sketch cost: two corpus scans reduced to k-row sketches,
    * ≤3k rows of arithmetic after that.
    *
    * Output: (n_union, n_only_a, kmv_union_estimate, kmv_diff_estimate
    * [4dp]) — exact (the estimate equals the true |A\B| restricted to
    * the sample) whenever the union is smaller than k.
    */
  def kmvDifference(a: DataFrame, aCol: Column, b: DataFrame, bCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sa = kmvSketch(a, aCol, k)
    val sb = kmvSketch(b, bCol, k)
    val u = sa.unionByName(sb).distinct().orderBy(col("h")).limit(k)
    val uEst = u.agg(max(col("h")).as("hk"), count(lit(1)).as("n_union"))
      .select(col("n_union"),
        when(col("n_union") < k, col("n_union").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("hk"), 4))
          .as("kmv_union_estimate"))
    u.join(sa, Seq("h"), "left_semi").join(sb, Seq("h"), "left_anti")
      .agg(count(lit(1)).as("n_only_a"))
      .crossJoin(broadcast(uEst))
      .select(col("n_union"), col("n_only_a"), col("kmv_union_estimate"),
        round(col("kmv_union_estimate") * col("n_only_a").cast("double")
          / col("n_union").cast("double"), 4).as("kmv_diff_estimate"))
  }

  /** Approximate quantiles by DETERMINISTIC hash sampling: keep the rows
    * whose h32(idCol) falls under `rate` (the same reproducible subset
    * Sampling.deterministic draws), then take EXACT per-group percentiles
    * of the sample.
    *
    * Spark's `approx_percentile` (Greenwald-Khanna) and DuckDB's
    * `approx_quantile` (t-digest) are engine-specific — useless under a
    * cross-engine exactness gate AND irreproducible run to run at scale.
    * A hash-sampled exact quantile is the deterministic alternative: the
    * sample is a pure function of the ids, so every engine computes the
    * identical estimate, and the error is the usual sampling error
    * (~O(1/sqrt(rate·n)) on quantile rank). The exact pass over the
    * sample shuffles only `rate` of the data; per-group sort cost shrinks
    * by the same factor.
    */
  /** The deterministic row sample behind [[sampledQuantiles]], exposed
    * separately because it is what makes the quantile sketch MERGEABLE:
    * membership is a pure function of the row's id (h32 < rate·P), so
    * sampling COMMUTES with sharding — per-shard samples union to
    * exactly the whole-corpus sample, no reconciliation, no bias. That
    * is the same incremental-ingest contract the HLL register tables and
    * KMV sketches carry (gates `sketch_hll_shards` / `sketch_kmv_shards`
    * / `sketch_quantile_shards`).
    */
  def quantileSample(df: DataFrame, idCol: Column, rate: Double,
      salt: String = ""): DataFrame = {
    require(rate > 0 && rate <= 1, s"rate must be in (0,1], got $rate")
    val threshold = math.max(0L, math.min(P, (rate * P).toLong))
    df.where(h32(concat(idCol.cast("string"), lit(salt))) < threshold)
  }

  /** Exact grouped percentiles of an (already sampled) table — the
    * reduce half of [[sampledQuantiles]].
    */
  def quantilesOfSample(sampled: DataFrame, valueCol: Column,
      groupCols: Seq[String], percentiles: Seq[Double]): DataFrame = {
    val aggs = percentiles.map(p =>
      round(percentile(valueCol, lit(p)), 6).as(s"p${(p * 100).toInt}"))
    sampled.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  def sampledQuantiles(df: DataFrame, idCol: Column, valueCol: Column,
      groupCols: Seq[String], percentiles: Seq[Double],
      rate: Double, salt: String = ""): DataFrame =
    quantilesOfSample(quantileSample(df, idCol, rate, salt), valueCol,
      groupCols, percentiles)

  /** Dense Bloom bitmap over `key`'s distinct values: `mBits` bits
    * (rounded up to a multiple of 64) packed into `m/64` longs, `k` probe
    * hashes per value (xxhash64 salted by probe index; the key is cast to
    * string first so build and probe agree regardless of column type).
    *
    * This is the explicit, stage-level version of the runtime row-level
    * filter Spark's optimizer injects on its own
    * (spark.sql.optimizer.runtime.bloomFilter.*): the build is one
    * map-side-combined bit_or aggregate over (word, mask) pairs — at most
    * m/64 rows cross the wire — and the bitmap itself is sketch-sized
    * by construction (default 1 MiB at m=2^23), the same driver-held
    * footprint class as a broadcast join's build relation. Use it where
    * the optimizer can't: pruning a fact table BEFORE its shuffle against
    * a dim too big to broadcast whole but whose key set fits a sketch.
    */
  def bloomBitmap(df: DataFrame, key: Column, mBits: Int = 1 << 23,
      k: Int = 5): Array[Long] = {
    require(mBits >= 64, s"mBits must be >= 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val m = ((mBits + 63) / 64) * 64
    val words = df.select(key.cast("string").as("__v"))
      .where(col("__v").isNotNull)
      .select(explode(array((0 until k).map(i =>
        pmod(xxhash64(col("__v"), lit(i)), lit(m.toLong))): _*)).as("__h"))
      .select(expr("__h div 64").as("__w"),
        expr("shiftleft(1L, cast(__h % 64 AS INT))").as("__m"))
      .groupBy("__w").agg(expr("bit_or(__m)").as("__or"))
      .collect()
    val arr = new Array[Long](m / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership probe against a [[bloomBitmap]] (same `k` required):
    * true if every probe bit is set — no false negatives, false-positive
    * rate ~(1 - e^(-k·n/m))^k. Pure codegen'd expression (element_at +
    * shift) over the bitmap literal; no UDF, no shuffle.
    */
  def bloomMightContain(key: Column, bits: Array[Long], k: Int = 5): Column = {
    require(bits.nonEmpty, "bits must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val m = bits.length * 64L
    val bcol = typedlit(bits.toSeq)
    (0 until k).map { i =>
      val h = pmod(xxhash64(key.cast("string"), lit(i)), lit(m))
      val w = element_at(bcol, (h / 64).cast("int") + 1)
      call_function("shiftrightunsigned", w, (h % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Per-group HyperLogLog distinct estimate (Flajolet et al. 2007),
    * deterministic and engine-portable — the mergeable counterpart to
    * [[kmvDistinct]] (KMV keeps k values; HLL keeps m 5-bit registers, so
    * per-GROUP cardinalities at 100 TB cost m·groups tiny integers).
    *
    * Same h32 hash as everything else, split h = m·q + bucket: `bucket`
    * indexes the register, rho = 1 + trailing zeros of the quotient `q`
    * (via `floor(log2(q & -q))` — log2 of a power of two is EXACT in
    * IEEE double, so both engines agree bit-for-bit; q = 0 pins rho to
    * `RhoCap`). Registers aggregate with max — commutative, so the
    * per-(group,bucket) max is map-side combinable and the register sum
    * Σ2^-M_j is exact in double (terms span < 53 bits of exponent).
    * Estimate = α_m·m²/(Σ2^-M_j + zeros) with the standard small-range
    * linear-counting correction m·ln(m/zeros).
    *
    * The exact distinct count rides along to make the estimate auditable
    * (drop it in production — it is the expensive half of the query).
    */
  def hllDistinct(df: DataFrame, keyCol: Column, groupCols: Seq[String],
      m: Int = 512): DataFrame = {
    val est = hllEstimate(hllRegisters(df, keyCol, groupCols, m), groupCols, m)
    val exact = df.groupBy(groupCols.head, groupCols.tail: _*)
      .agg(count_distinct(keyCol).as("exact_distinct"))
    exact.join(est, groupCols)
  }

  /** The HLL register table (groupCols..., bucket, rho-max) for `keyCol` —
    * the PERSISTABLE form of the sketch. Registers merge across shards /
    * days / partial corpora with a plain `max` re-aggregation (see
    * [[hllMerge]]): at 100 TB the register tables of daily increments are
    * a few KB each, and any union of them estimates the union of the
    * inputs without touching the data again.
    */
  def hllRegisters(df: DataFrame, keyCol: Column, groupCols: Seq[String],
      m: Int = 512): DataFrame = {
    require(m >= 128 && (m & (m - 1)) == 0, s"m must be a power of two >= 128, got $m")
    val g = groupCols.map(col)
    val (b, rho) = registerCoords(keyCol, m)
    df.select(g :+ b.as("__b") :+ rho.as("__rho"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "__b": _*)
      .agg(max(col("__rho")).as("__m"))
  }

  /** (bucket, rho) register coordinates of `keyCol` under width `m` — the
    * shared hashing of [[hllRegisters]], exposed so PACKED register
    * consumers ([[graft.ops.Graph.neighborhoodSizes]]'s per-node byte
    * buffers) agree with the row form bit-for-bit.
    */
  def registerCoords(keyCol: Column, m: Int): (Column, Column) = {
    val h = h32(keyCol.cast("string"))
    val q = (h / m).cast("long") // quotient: the rho domain, ~log2(P/m) bits
    val rho = when(q === 0, lit(RhoCap))
      .otherwise(floor(log2((q.bitwiseAND(-q)).cast("double"))).cast("long") + 1)
    ((h % m), rho)
  }

  /** Merge register tables from disjoint (or overlapping — HLL is a
    * union sketch) inputs: per-(group, bucket) max. All inputs must have
    * been built with the SAME `m` (the bucket domain is implicit in the
    * rows; mixing widths silently corrupts the estimate — persist m next
    * to any long-lived register table).
    */
  def hllMerge(regTables: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(regTables.nonEmpty, "need at least one register table")
    regTables.reduce(_ unionByName _)
      .groupBy(groupCols.head, groupCols.tail :+ "__b": _*)
      .agg(max(col("__m")).as("__m"))
  }

  /** Estimate from a register table: α_m·m²/(Σ2^-M_j + zeros) with the
    * linear-counting small-range correction, rounded to 4dp.
    */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
      m: Int = 512): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val g = groupCols.map(col)
    regs
      .groupBy(groupCols.head, groupCols.tail: _*)
      .agg(
        sum(pow(lit(2.0), -col("__m"))).as("__inv"),
        count(lit(1)).as("__nb"))
      .select(g :+ {
        val zeros = lit(m) - col("__nb")
        val raw = lit(alpha * m.toDouble * m) / (col("__inv") + zeros)
        val corrected = when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros))
          .otherwise(raw)
        round(corrected, 4).as("hll_estimate")
      }: _*)
  }

  /** Cross-corpus overlap estimate by inclusion-exclusion over HLL
    * register tables: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where the
    * union estimate comes from the register-level max-merge ([[hllMerge]])
    * — the standard way to ask "how much of corpus B have we already
    * got?" from a few KB of persisted sketch per side, without ever
    * joining the corpora. Clamped at 0 (the estimator can go slightly
    * negative for near-disjoint inputs); error grows as the true
    * intersection shrinks relative to the union (inclusion-exclusion
    * differences three same-scale estimates), so treat small results as
    * "≈ disjoint", not as precise counts.
    *
    * Both inputs must share the same `m`. Deterministic: each estimate is
    * the usual exact-register formula rounded to 4dp; the difference of
    * the three rounded doubles is exact, re-rounded to 4dp.
    */
  def hllIntersectEstimate(regsA: DataFrame, regsB: DataFrame,
      groupCols: Seq[String], m: Int = 512): DataFrame = {
    val ea = hllEstimate(regsA, groupCols, m)
      .withColumnRenamed("hll_estimate", "__ea")
    val eb = hllEstimate(regsB, groupCols, m)
      .withColumnRenamed("hll_estimate", "__eb")
    val eu = hllEstimate(hllMerge(Seq(regsA, regsB), groupCols), groupCols, m)
      .withColumnRenamed("hll_estimate", "__eu")
    ea.join(eb, groupCols).join(eu, groupCols)
      .select(groupCols.map(col) :+
        (round(greatest(lit(0d), col("__ea") + col("__eb") - col("__eu")), 4)
          + lit(0d)).as("hll_intersection"): _*)
  }

  /** Rolling distinct estimate per time bucket: "distinct users over the
    * trailing `window` days", the query whose EXACT form is disqualifying
    * at scale (distinct does not decompose over a sliding window — every
    * window re-scans its raw rows). With register tables it is linear:
    * sketch each bucket once, then each target bucket max-merges the
    * trailing `window` buckets' registers. The window is by bucket
    * NUMBER (calendar), so gaps count as empty buckets; only buckets
    * present in the data are emitted. `bucketCol` must be integral
    * (e.g. epoch-days).
    *
    * Shape at scale: the corpus is scanned ONCE into ≤ buckets·m register
    * rows (map-side-combined max); the re-merge explodes each register
    * row to its `window` target buckets — registers × window tiny rows,
    * never data — and aggregates by (target, register). A year of daily
    * buckets at m=512 is ~187k rows serving any window length.
    */
  def hllRolling(df: DataFrame, bucketCol: Column, keyCol: Column,
      window: Int, m: Int = 512): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val regs = hllRegisters(
      df.select(bucketCol.cast("long").as("bucket"), keyCol.as("__k")),
      col("__k"), Seq("bucket"), m)
    // a bucket's registers serve target windows [bucket, bucket+window-1]
    val contrib = regs.select(
      explode(sequence(col("bucket"), col("bucket") + (window - 1)))
        .as("bucket"),
      col("__b"), col("__m"))
    val merged = contrib.groupBy("bucket", "__b").agg(max("__m").as("__m"))
    hllEstimate(merged, Seq("bucket"), m)
      .join(regs.select("bucket").distinct(), Seq("bucket"), "left_semi")
  }

  /** rho ceiling for a zero quotient: the quotient domain P/m is ~21 bits
    * for the default m, so 22 is "all bits zero" — any fixed constant
    * works as long as the oracle uses the same one.
    */
  val RhoCap = 22L

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005) frequency table plus
    * point estimates for the `topN` heaviest keys, fully integer (hash-
    * exact across engines).
    *
    * Build: each row lands in `depth` cells (`h32(r || key) % width`);
    * the sketch is a map-side-combined count over (row, cell) — at most
    * depth·width rows ever cross the wire, REGARDLESS of input size: the
    * 100 TB story is the sketch build reads everything once and shuffles
    * a fixed few KB. Probe: estimate(key) = min over rows of its cell
    * count (overestimates only, by collision mass). The exact counts of
    * the probed keys ride along for auditability; production would probe
    * a known key list and skip the exact pass.
    */
  def cmsHeavy(df: DataFrame, keyCol: Column, depth: Int = 4,
      width: Int = 256, topN: Int = 10): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got $depth x $width")
    val rowsIdx = (0 until depth).map(lit(_))
    // ONE md5 per key, then the universal-hash family per CMS row
    // (the MinHash permutation constants): an md5 per (row, key) concat
    // measured ~2x the whole build cost at sf0.1, and the
    // pairwise-independence the CMS bound needs is exactly what
    // (a_r·h + b_r) mod P provides.
    val cellOf = (r: Column, h: Column) =>
      (((r + 1) * lit(2654435761L) % P) * h + (r + 1) * lit(40503L) % P) % P % width
    val cms = df
      .select(h32(keyCol.cast("string")).as("__h"))
      .select(explode(array(rowsIdx: _*)).as("__r"), col("__h"))
      .select(col("__r"), cellOf(col("__r"), col("__h")).as("__c"))
      .groupBy("__r", "__c").agg(count(lit(1)).as("__cnt"))
    // heaviest keys by exact count; key asc tie-break keeps output stable
    val heavy = df.groupBy(keyCol.cast("string").as("key"))
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("key")).limit(topN)
    val probes = heavy.select(col("key"), col("exact_count"),
      explode(array(rowsIdx: _*)).as("__r"))
      .withColumn("__c", cellOf(col("__r"), h32(col("key"))))
    probes.join(broadcast(cms), Seq("__r", "__c"))
      .groupBy("key", "exact_count")
      .agg(min(col("__cnt")).as("cms_estimate"))
  }

  /** (row, cell, count) CMS table of `keyCol` — one md5 per key, the
    * MinHash-constant universal-hash family per row (the [[cmsHeavy]]
    * build, shared).
    */
  private def cmsTable(df: DataFrame, keyCol: Column, depth: Int,
      width: Int): DataFrame = {
    val rowsIdx = (0 until depth).map(lit(_))
    val cellOf = (r: Column, h: Column) =>
      (((r + 1) * lit(2654435761L) % P) * h + (r + 1) * lit(40503L) % P) % P % width
    df.select(h32(keyCol.cast("string")).as("__h"))
      .select(explode(array(rowsIdx: _*)).as("__r"), col("__h"))
      .select(col("__r"), cellOf(col("__r"), col("__h")).as("__c"))
      .groupBy("__r", "__c").agg(count(lit(1)).as("__cnt"))
  }

  /** Equi-join output-size estimate from two CMS sketches — the classic
    * sketch inner product (Alon-Matias-Szegedy F2 machinery in CMS form,
    * Cormode & Muthukrishnan 2005): true size = Σ_k cA(k)·cB(k), and
    * min_r Σ_cell cmsA[r][cell]·cmsB[r][cell] overestimates it by at
    * most ε·N_A·N_B with the usual (ε, δ) guarantees. THE pre-shuffle
    * planning question at 100 TB — "can this join's output fit?" —
    * answered from two KB-sized sketches without touching either table's
    * payload.
    *
    * Output: one row (exact_pairs, cms_estimate, depth, width). The
    * exact column is the calibration baseline (the [[cmsHeavy]]
    * exact_count convention): it joins the two KEY-COUNT tables
    * (vocabulary-sized, map-side combined — never the raw rows). The
    * estimate path alone shuffles only 2·depth·width sketch cells; at
    * planning time that is the whole cost.
    */
  def cmsJoinSize(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got $depth x $width")
    val pa = cmsTable(a, aKey, depth, width)
    val pb = cmsTable(b, bKey, depth, width)
    val est = pa.join(pb, Seq("__r", "__c"))
      .groupBy("__r")
      .agg(sum(pa("__cnt") * pb("__cnt")).as("__ip"))
      .agg(min("__ip").as("cms_estimate"))
    val exact = a.groupBy(aKey.cast("string").as("k"))
      .agg(count(lit(1)).as("ca"))
      .join(b.groupBy(bKey.cast("string").as("k")).agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_pairs"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_pairs"), col("cms_estimate"),
        lit(depth).cast("long").as("depth"), lit(width).cast("long").as("width"))
  }
}

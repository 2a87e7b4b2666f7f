package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (Jégou, Douze & Schmid, TPAMI 2011) — the
  * standard memory-compression layer of large-scale vector search,
  * complementing [[Similarity.quantize]] (scalar int8, 4×) with the
  * 10-100× regime: the embedding splits into `subspaces` contiguous
  * subvectors, each subspace learns its own small k-means codebook, and
  * a vector is stored as `subspaces` centroid ids. Search runs
  * ASYMMETRIC DISTANCE COMPUTATION (ADC): the query precomputes its
  * distance to every centroid of every subspace (a subspaces×K lookup
  * table, tiny), and a candidate's approximate distance is just the sum
  * of `subspaces` table lookups — no decompression, no full-width
  * arithmetic per candidate.
  *
  * Determinism contract (the [[Similarity]] conventions): subvector
  * distances accumulate sequentially in double and round to 6dp before
  * any comparison (argmin ties break to the smallest centroid id);
  * centroid updates use the order-insensitive fixed-point (×2^20) long
  * sums; the ADC total is a SUM OF fixed-point LONGS (exact under any
  * combine order — a double sum here would drift with partitioning).
  * Every step replays bit-for-bit in the DuckDB oracle.
  *
  * Scale shape: training seeds are the deterministic
  * `vec_id % centroidEvery == 0` subset (codebooks broadcast
  * everywhere); encoding is one broadcast join + per-(vec, subspace)
  * argmin; the codes table is `subspaces` longs per vector — the thing
  * that fits in memory at 100 TB when raw embeddings do not; ADC joins
  * the (small) per-query lookup table to the codes table keyed
  * (subspace, code) and map-side-combines the per-pair sum.
  */
object Pq {

  /** Fixed-point scale shared with [[Similarity.FixedScale]]. */
  private val Fp = 1048576.0 // 2^20

  /** Per-subspace rows (vec_id, s, sv) with sv = the s-th `subDim`-wide
    * slice of the embedding, as double. Rows whose embedding is not
    * exactly `subspaces*subDim` wide are dropped (ragged vectors cannot
    * quantize — the projectSigned convention).
    */
  private def subvectors(df: DataFrame, subspaces: Int,
      subDim: Int): DataFrame =
    df.where(size(col("embedding")) === subspaces * subDim)
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(subspaces - 1))).as("s"),
        col("embedding"))
      .select(col("vec_id"), col("s"),
        transform(slice(col("embedding"), col("s") * subDim + 1, lit(subDim)),
          x => x.cast("double")).as("sv"))

  /** Squared L2 between two equal-width double arrays: sequential
    * accumulation, 6dp round, -0 normalized — the comparison key of
    * every argmin below. Native codegen'd kernel
    * ([[graft.functions.Expressions.SquaredL2]]), bit-identical to the
    * zip_with/aggregate fold it replaced — the interpreted HOF pair cost
    * ~2 s per corpus×K assignment pass at sf0.1.
    */
  private def dist2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    round(org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.Expressions.SquaredL2(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b))), 6) + lit(0d)

  /** Assign every (vec_id, s) subvector to its min-distance codebook
    * entry (ties to the smallest c_id). Codebooks broadcast — they are
    * subspaces × K rows. The argmin is a lexicographic struct MIN
    * (distance, then id), not a window: map-side partial aggregation
    * keeps one candidate per (vec, s) per partition and nothing sorts —
    * the same winner a (dist asc, c_id asc) row_number would pick, at a
    * fraction of the cost (measured 5.2 s → window vs struct-min on the
    * K=80 sf0.1 configuration).
    */
  private def assign(sub: DataFrame, codebooks: DataFrame): DataFrame =
    sub.join(broadcast(codebooks), Seq("s"))
      .select(col("vec_id"), col("s"), col("c_id"),
        dist2(col("sv"), col("c_emb")).as("__d"))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("__d"), col("c_id"))).as("__m"))
      .select(col("vec_id"), col("s"), col("__m.c_id").as("c_id"),
        col("__m.__d").as("__d"))

  /** Train per-subspace codebooks: seeds are the subvectors of the
    * deterministic `vec_id % centroidEvery == 0` rows (so every
    * subspace has the same K = |seeds| entry ids), refined by `iters`
    * Lloyd rounds under the fixed-point centroid update. Output
    * (s, c_id, c_emb).
    */
  def train(corpus: DataFrame, subspaces: Int = 8, subDim: Int = 8,
      centroidEvery: Int = 100, iters: Int = 1): DataFrame = {
    require(subspaces >= 1 && subDim >= 1, "subspaces and subDim must be >= 1")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val sub = graft.util.Caches.persist(
      subvectors(corpus, subspaces, subDim))
    var cb = sub.where(col("vec_id") % centroidEvery === 0)
      .select(col("s"), col("vec_id").as("c_id"), col("sv").as("c_emb"))
    for (_ <- 1 to iters) {
      // NOTE (round 19): carrying `sv` through the argmin struct was
      // measured SLOWER here (pq family 1.2-1.5x) — an array field in
      // the aggregation buffer forces object/sort aggregation, while
      // this min(struct(double, long)) stays a fixed-width hash
      // aggregate and the re-join is cheap. The opposite trade from
      // Similarity.assignCellsWithEmbedding, where the payload argmax
      // replaced a window+join, not a hash agg.
      val members = assign(sub, cb)
        .join(sub, Seq("vec_id", "s"))
      cb = members
        .select(col("s"), col("c_id"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy(col("s"), col("c_id"), col("d"))
        .agg(sum(round(col("x") * Fp).cast("long")).as("__sum"),
          count(lit(1)).as("__n"))
        .groupBy(col("s"), col("c_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("d"),
            (col("__sum").cast("double") / col("__n") / Fp).as("m")))),
          e => e.getField("m")).as("c_emb"))
    }
    // persisted: the codebook (subspaces × K rows, tiny) feeds BOTH the
    // encode assignment and the ADC lookup table — without the persist
    // the whole training subplan executes once per consumer
    graft.util.Caches.persist(cb.select("s", "c_id", "c_emb"))
  }

  /** Encode the corpus against trained codebooks: (vec_id, codes) with
    * codes[s] = the s-th subspace's argmin centroid id.
    */
  def encode(corpus: DataFrame, codebooks: DataFrame, subspaces: Int = 8,
      subDim: Int = 8): DataFrame =
    assign(subvectors(corpus, subspaces, subDim), codebooks)
      .groupBy("vec_id")
      .agg(transform(
        sort_array(collect_list(struct(col("s"), col("c_id")))),
        e => e.getField("c_id")).as("codes"))

  /** ADC top-k: for each query, the `k` nearest corpus vectors by
    * asymmetric distance Σ_s ||q_s − c_{codes[s]}||². The query side is
    * small by contract (broadcast); the per-query lookup table is
    * subspaces × K rows; candidates never decompress. Same-id pairs are
    * excluded (the corpus-contains-queries convention of
    * [[Similarity.bruteTopK]]). Output (q_id, n_id, adist, rank),
    * ranked (adist asc, n_id asc).
    */
  def adcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int, subspaces: Int = 8, subDim: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lut = lutOf(queries, codebooks, subspaces, subDim)
    val entries = codes.select(col("vec_id").as("n_id"),
      posexplode(col("codes")).as(Seq("s", "c_id")))
    val pairs = entries.join(broadcast(lut), Seq("s", "c_id"))
      .where(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg((sum(col("__pd")).cast("double") / Fp).as("adist"))
    rankAsc(pairs, k)
  }

  /** Per-(query, subspace, centroid) partial distances as fixed-point
    * longs — the ADC lookup table (queries × subspaces × K rows, tiny).
    */
  private def lutOf(queries: DataFrame, codebooks: DataFrame,
      subspaces: Int, subDim: Int): DataFrame =
    subvectors(queries, subspaces, subDim)
      .withColumnRenamed("vec_id", "q_id")
      .join(codebooks, Seq("s"))
      .select(col("q_id"), col("s"), col("c_id"),
        round(dist2(col("sv"), col("c_emb")) * Fp).cast("long").as("__pd"))

  private def rankAsc(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-PQ — the production vector-search configuration (the FAISS
    * `IVFx,PQy` default at scale): the corpus partitions into coarse
    * k-means CELLS (the [[Similarity.ivfTopK]] machinery — centroids
    * broadcast, each query probes its `probes` nearest cells), and
    * within the probed cells candidates are scored by PQ ASYMMETRIC
    * DISTANCE over the codes table — so a query touches probes/nCells
    * of the corpus and pays `subspaces` fixed-point lookups per
    * candidate, never a full-width operation. Output
    * (q_id, n_id, adist, rank).
    *
    * Two independent quantizers by design (cells on cosine geometry,
    * codebooks on raw subvectors): the cell prunes WHERE to look, the
    * codes compress WHAT is compared — each replayable on its own, and
    * the composition is one candidate join keyed on the cell.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cellEvery: Int = 100, cellIters: Int = 2, probes: Int = 1,
      subspaces: Int = 8, subDim: Int = 8, pqCentroidEvery: Int = 25,
      pqIters: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val cv = graft.util.Caches.persist(Similarity.withNorm(corpus))
    val cents = graft.util.Caches.persist(
      Similarity.trainCentroids(cv, cellEvery, cellIters,
        exactReplay = false))
    val cells = Similarity.assignCells(cv, "vec_id", cents)
    val qv = graft.util.Caches.persist(Similarity.withNorm(queries))
    val qcells = Similarity.assignCells(
      qv.withColumnRenamed("vec_id", "q_id"), "q_id", cents, probes)
    val cand = qcells.join(cells, Seq("cell"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
    val cb = train(corpus, subspaces, subDim, pqCentroidEvery, pqIters)
    val codes = encode(corpus, cb, subspaces, subDim)
    val entries = codes.select(col("vec_id").as("n_id"),
      posexplode(col("codes")).as(Seq("s", "c_id")))
    val lut = lutOf(queries, cb, subspaces, subDim)
    val pairs = cand.join(entries, "n_id")
      .join(broadcast(lut), Seq("q_id", "s", "c_id"))
      .groupBy("q_id", "n_id")
      .agg((sum(col("__pd")).cast("double") / Fp).as("adist"))
    rankAsc(pairs, k)
  }

  /** Recall@k of the ADC path against exact full-width L2 ground truth
    * — the [[Similarity.annRecall]] convention for the PQ layer: run it
    * on a query SAMPLE after retuning subspaces/K, the corpus never pays
    * for its own evaluation. Output (q_id, hits, recall); the left join
    * keeps zero-recall queries visible.
    *
    * Interpretation note: PQ recall is a function of how much CLUSTER
    * STRUCTURE the corpus has — on near-uniform random vectors (the
    * synthetic gate embeddings) even a dense codebook scores low,
    * because within-cell quantization error swamps the tiny true
    * neighbor gaps; on clustered data the same configuration is
    * near-perfect (PqSpec pins both regimes). That sensitivity is WHY
    * the gauge ships next to the operator.
    */
  def adcRecall(corpus: DataFrame, queries: DataFrame, k: Int,
      subspaces: Int = 8, subDim: Int = 8, centroidEvery: Int = 100,
      iters: Int = 1): DataFrame = {
    val cb = train(corpus, subspaces, subDim, centroidEvery, iters)
    val approx = adcTopK(encode(corpus, cb, subspaces, subDim), cb,
      queries, k, subspaces, subDim)
    recallVsExact(corpus, queries, approx, k, subspaces * subDim)
  }

  /** Recall@k of `approx` (q_id, n_id rows) against exact full-width L2
    * ground truth on the RAW corpus — shared by [[adcRecall]] and
    * [[adcRecallOpq]] so the two gauges are directly comparable.
    */
  private def recallVsExact(corpus: DataFrame, queries: DataFrame,
      approx: DataFrame, k: Int, dim: Int): DataFrame = {
    // exact L2 truth: queries broadcast, full-width sequential fold
    val qv = broadcast(queries.where(size(col("embedding")) === dim)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("q_emb")))
    val cvv = corpus.where(size(col("embedding")) === dim)
      .select(col("vec_id").as("n_id"),
        transform(col("embedding"), x => x.cast("double")).as("n_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("__d").asc, col("n_id").asc)
    val truth = qv.join(cvv, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        dist2(col("q_emb"), col("n_emb")).as("__d"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .select("q_id", "n_id")
    truth
      .join(approx.select(col("q_id"), col("n_id"), lit(1L).as("__hit")),
        Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(coalesce(sum("__hit"), lit(0L)).as("hits"))
      .select(col("q_id"), col("hits"),
        round(col("hits") / k.toDouble, 6).as("recall"))
  }

  /** OPQ — the Optimized Product Quantization rotation (Ge, He, Ke &
    * Sun, CVPR 2013), PARAMETRIC variant (OPQ-P, their §4): PCA-rotate
    * the space, then allocate principal directions to subspaces so the
    * PRODUCT of eigenvalues is balanced across subspaces (eigenvalue
    * allocation — under the Gaussian model, independence between
    * subspaces plus balanced variance minimizes quantization distortion
    * for a fixed code budget). Plain PQ on raw coordinates wastes
    * codebook capacity whenever variance concentrates inside one
    * subspace's dims; the non-parametric alternating OPQ needs a
    * dim×dim SVD per iteration and buys little over OPQ-P on
    * near-Gaussian embedding corpora (Ge et al., Table 2 / 3).
    *
    * Driver footprint is dim²-bounded (the [[Pca]] contract): one exact
    * fixed-point covariance pass, power iteration with Gram–Schmidt
    * deflation for ALL dim eigenvectors (deterministic — fixed start
    * vector, fixed iteration count, sign-normalized), eigenvalues
    * λ_p = v_pᵀCv_p, then greedy allocation in descending-λ order to the
    * unfilled subspace with the smallest running Σlog λ (ties to the
    * smaller subspace index). Rows of the returned rotation are the
    * reallocated eigenvectors in subspace-major order — subspace s owns
    * rotated dims [s·subDim, (s+1)·subDim).
    */
  def opqRotation(corpus: DataFrame, subspaces: Int = 8, subDim: Int = 8,
      powerIters: Int = 30): Seq[Seq[Double]] = {
    require(subspaces >= 1 && subDim >= 1, "subspaces and subDim must be >= 1")
    val dim = subspaces * subDim
    val cov = graft.util.Caches.persist(Pca.covariance(corpus, dim = dim))
    val comps = Pca.principalComponents(cov, dim, k = dim,
      iters = powerIters).collect()
    val v = Array.ofDim[Double](dim, dim)
    comps.foreach { r =>
      v(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2)
    }
    val c = Array.ofDim[Double](dim, dim)
    cov.select("i", "j", "cov").collect().foreach { r =>
      val (i, j, x) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = x; c(j)(i) = x
    }
    val lambda = Array.tabulate(dim) { p =>
      var s = 0.0
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { s += v(p)(i) * c(i)(j) * v(p)(j); j += 1 }
        i += 1
      }
      math.max(s, 0.0)
    }
    val logProd = Array.fill(subspaces)(0.0)
    val fill = Array.fill(subspaces)(0)
    val slots = Array.ofDim[Int](subspaces, subDim)
    // power iteration emits decreasing-λ components already; re-sort
    // defensively so allocation order never depends on convergence luck
    (0 until dim).sortBy(p => (-lambda(p), p)).foreach { p =>
      val s = (0 until subspaces).filter(fill(_) < subDim)
        .minBy(t => (logProd(t), t))
      slots(s)(fill(s)) = p
      fill(s) += 1
      logProd(s) += math.log(math.max(lambda(p), 1e-12))
    }
    for (s <- 0 until subspaces; q <- 0 until subDim)
      yield v(slots(s)(q)).toSeq
  }

  /** Apply a rotation (rows = new basis vectors as plan literals):
    * rotated[r] = Σ_d R[r][d]·x[d], 6dp-rounded per coordinate — `dim`
    * native codegen'd dot products per row ([[graft.functions
    * .VectorFunctions.dot]]); narrow projection, no join, no shuffle,
    * no UDF. Rows of the wrong width are dropped (the subvectors
    * contract does the same downstream).
    */
  def rotate(df: DataFrame, rotation: Seq[Seq[Double]],
      vecCol: String = "embedding"): DataFrame = {
    require(rotation.nonEmpty, "rotation must have rows")
    val dim = rotation.head.size
    require(rotation.forall(_.size == dim), "rotation rows must be square")
    val staged = df.where(size(col(vecCol)) === dim)
      .withColumn("__e", col(vecCol).cast("array<double>"))
    staged
      .withColumn(vecCol, array(rotation.map { row =>
        round(graft.functions.VectorFunctions.dot(col("__e"),
          array(row.map(lit): _*)), 6) + lit(0d)
      }: _*))
      .drop("__e")
  }

  /** [[adcRecall]] with the OPQ rotation trained on the corpus and
    * applied to corpus AND queries before codebook training/encoding/ADC
    * — ground truth stays the RAW full-width L2 (the rotation is
    * orthonormal, so the true neighbor sets are identical up to
    * rounding), which keeps this gauge directly comparable to
    * [[adcRecall]]: same queries, same truth, only the quantizer
    * changes. Output (q_id, hits, recall).
    */
  def adcRecallOpq(corpus: DataFrame, queries: DataFrame, k: Int,
      subspaces: Int = 8, subDim: Int = 8, centroidEvery: Int = 100,
      iters: Int = 1, powerIters: Int = 30): DataFrame = {
    // Regime note (the adcRecall honesty convention): OPQ's payoff needs
    // ANISOTROPY. On the near-uniform synthetic gate embeddings the
    // eigenvalue spectrum is Marchenko-Pastur-flat, the learned basis is
    // effectively an arbitrary rotation, and measured recall sits at
    // plain-PQ level (0.242 vs 0.259 at k=10 over 100 queries — inside
    // the rotation lottery's spread); on low-rank clustered corpora —
    // real embedding corpora — the same configuration measures ABOVE
    // plain PQ (0.913 vs 0.900 on PqSpec's diagonal-structure fixture,
    // which pins opq >= plain). Ge et al. report the same shape: OPQ's
    // gains track how unbalanced the per-subspace variance is.
    adcRecallOpqWith(corpus, queries,
      opqRotation(corpus, subspaces, subDim, powerIters), k,
      subspaces, subDim, centroidEvery, iters)
  }

  /** [[adcRecallOpq]] with an ALREADY-TRAINED rotation — the split that
    * lets a caller hold on to the trained dim×dim matrix (the gate's
    * oracle materializes it as plan-time literals so DuckDB can replay
    * rotate → train → encode → ADC → recall end to end).
    */
  def adcRecallOpqWith(corpus: DataFrame, queries: DataFrame,
      rotation: Seq[Seq[Double]], k: Int, subspaces: Int = 8,
      subDim: Int = 8, centroidEvery: Int = 100,
      iters: Int = 1): DataFrame = {
    val rc = graft.util.Caches.persist(rotate(corpus, rotation))
    val rq = rotate(queries, rotation)
    val cb = train(rc, subspaces, subDim, centroidEvery, iters)
    val approx = adcTopK(encode(rc, cb, subspaces, subDim), cb,
      rq, k, subspaces, subDim)
    recallVsExact(corpus, queries, approx, k, subspaces * subDim)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed PCA for embedding corpora (SURVEY §2.3 embedding
  * family): covariance via fixed-point integer sums, principal components
  * via driver-side power iteration on the (dim × dim)-bounded matrix,
  * projection as a narrow plan-literal dot product.
  *
  * The split is the scale design: the only corpus-sized work is ONE
  * `mapPartitions` pass that accumulates each partition's Gram/mean
  * partials locally and emits d(d+1)/2 + d + 1 rows per PARTITION — the
  * shuffle is partition-count × dim²-bounded, never corpus-sized, and the
  * driver touches only the d × d matrix (the classic tall-skinny regime:
  * at 100 TB, dim stays 64–4096 while rows go to billions). All sums are
  * fixed-point longs reduced into DECIMAL(38,0) — exact, order-insensitive,
  * engine-replayable; the eigen step is deterministic double math on that
  * exact input.
  */
object Pca {

  import Similarity.FixedScale

  /** Spark's `round(x)` semantics (HALF_UP — ties away from zero,
    * matching DuckDB's `round`): the quantizer every fixed-point gate in
    * this engine shares, applied here inside the JVM accumulator so the
    * partials equal what the SQL expression form would produce.
    *
    * Primitive, not BigDecimal: for |x| < 2^51 the midpoint
    * floor(x)+0.5 is an EXACT double (x−floor(x) is NOT — the
    * subtraction can round onto 0.5 and misclassify near-ties), so
    * comparing x against the midpoint reproduces
    * BigDecimal(x).setScale(0, HALF_UP) bit-for-bit (property-tested in
    * PcaSpec) at ~20× less cost — this runs d(d+1)/2 + d times per ROW,
    * so the constant factor is the covariance pass's scan cost.
    */
  private def q(x: Double): Long = {
    val f = math.floor(x)
    val mid = f + 0.5 // exact for |f| < 2^51
    val r = if (x > mid) f + 1
      else if (x < mid) f
      else if (x > 0) f + 1 else f // exact tie: away from zero
    r.toLong
  }

  /** Long-format exact covariance of the embedding corpus:
    * (i, j, cov) for 0 <= i <= j < dim, cov rounded to 6dp.
    *
    * cov(i,j) = Σq(x_i·x_j·S)/n/S − (Σq(x_i·S)/n/S)·(Σq(x_j·S)/n/S) with
    * S = 2^20 — per-row quantization then exact integer sums, so the
    * result is a pure function of the data under any layout or combine
    * order. Rows whose embedding length differs from `dim` fail loudly
    * (a silent skip would bias every moment).
    *
    * Caller contract: values must be NON-NULL and of bounded magnitude —
    * the per-partition partial q(x_i·x_j·S) sums live in longs, so
    * \|x\| ≲ 10³ keeps ~10⁷-row partitions overflow-free (embeddings
    * qualify by construction; arbitrary measures should pre-scale the
    * way [[Profile.correlationMatrix]] does with max(\|x\|)).
    */
  def covariance(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    val nPairs = dim * (dim + 1) / 2
    val partials = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("e"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val gram = new Array[Long](nPairs)
        val sums = new Array[Long](dim)
        var n = 0L
        it.foreach { case (id, e) =>
          if (e == null || e.length != dim)
            throw new IllegalArgumentException(
              s"Pca.covariance: vector $id has length " +
                s"${if (e == null) "null" else e.length}, expected $dim")
          var i = 0
          var p = 0
          while (i < dim) {
            sums(i) += q(e(i) * FixedScale)
            var j = i
            while (j < dim) {
              gram(p) += q(e(i) * e(j) * FixedScale)
              j += 1; p += 1
            }
            i += 1
          }
          n += 1
        }
        val out = Iterator.single((-1, -1, n)) ++
          Iterator.tabulate(dim)(i => (i, -1, sums(i))) ++ {
            var p = -1
            for (i <- 0 until dim; j <- i until dim) yield { p += 1; (i, j, gram(p)) }
          }.iterator
        if (n == 0) Iterator.empty else out
      }
      .toDF("i", "j", "s")
    val tot = partials.groupBy("i", "j")
      .agg(sum(col("s").cast("decimal(38,0)")).as("s"))
    val nRow = tot.where(col("i") === -1 && col("j") === -1)
      .select(col("s").cast("double").as("n"))
    val means = tot.where(col("i") >= 0 && col("j") === -1)
      .select(col("i").as("mi"), col("s").as("sx"))
    tot.where(col("j") >= 0)
      .crossJoin(broadcast(nRow))
      .join(broadcast(means).withColumnRenamed("mi", "__a"),
        col("i") === col("__a"))
      .withColumnRenamed("sx", "sxi")
      .join(broadcast(means).withColumnRenamed("mi", "__b"),
        col("j") === col("__b"))
      .withColumnRenamed("sx", "sxj")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        (round(
          col("s").cast("double") / col("n") / FixedScale
            - (col("sxi").cast("double") / col("n") / FixedScale)
            * (col("sxj").cast("double") / col("n") / FixedScale),
          6) + lit(0d)).as("cov"))
  }

  /** Top-`k` principal components by power iteration with Gram–Schmidt
    * deflation, from a long-format covariance table ([[covariance]]'s
    * output — `dim²`-bounded, the ONLY thing collected). Deterministic:
    * fixed start vector 1/√dim, `iters` iterations per component, sign
    * normalized so each component's largest-|loading| entry is positive.
    * Output: (component, dim, loading[6dp]), component 0-based in
    * decreasing-eigenvalue order.
    */
  def principalComponents(cov: DataFrame, dim: Int, k: Int = 1,
      iters: Int = 30): DataFrame = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val c = Array.ofDim[Double](dim, dim)
    cov.select("i", "j", "cov").collect().foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    val comps = Array.ofDim[Double](k, dim)
    for (comp <- 0 until k) {
      // remove projections onto already-found components; BOTH the input
      // and the product vector must be deflated every iteration — a
      // product against a numerically-rank-deficient C (6dp-rounded
      // covariances) otherwise reinjects the dominant direction at noise
      // scale, which DOMINATES once the true residual eigenvalue is ~0
      def deflate(v: Array[Double]): Unit =
        for (p <- 0 until comp) {
          val d = dot(v, comps(p))
          var i = 0
          while (i < dim) { v(i) -= d * comps(p)(i); i += 1 }
        }
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      deflate(v)
      for (_ <- 1 to iters) {
        val w = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var s = 0.0; var j = 0
          while (j < dim) { s += c(i)(j) * v(j); j += 1 }
          w(i) = s; i += 1
        }
        deflate(w)
        val nrm = math.sqrt(dot(w, w))
        // a ~zero product means the spectrum is exhausted: keep the
        // current (deflated) direction rather than amplifying noise
        if (nrm > 1e-12) v = w.map(_ / nrm)
      }
      val vn = math.sqrt(dot(v, v))
      if (vn > 0) v = v.map(_ / vn)
      val amax = v.indices.maxBy(i => math.abs(v(i)))
      comps(comp) = if (v(amax) < 0) v.map(-_) else v
    }
    val spark = cov.sparkSession
    import spark.implicits._
    (for (p <- 0 until k; i <- 0 until dim)
      yield (p.toLong, i.toLong,
        BigDecimal(comps(p)(i)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
      .toDF("component", "dim", "loading")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Project the corpus onto `components` (rows of loadings, e.g. the
    * collected [[principalComponents]]): adds `pc0..pc{k-1}` columns,
    * each the 6dp-rounded dot product against a PLAN-LITERAL loading
    * vector — narrow, no join, no shuffle; the HOF dot product is staged
    * on a materialized double array per the engine's HOF perf contract.
    */
  def project(df: DataFrame, components: Seq[Seq[Double]],
      vecCol: String = "embedding"): DataFrame = {
    require(components.nonEmpty, "at least one component")
    val staged = df.withColumn("__e", col(vecCol).cast("array<double>"))
    val out = components.zipWithIndex.foldLeft(staged) {
      case (d, (comp, idx)) =>
        val lits = array(comp.map(lit): _*)
        d.withColumn(s"pc$idx",
          round(aggregate(zip_with(col("__e"), lits, (x, w) => x * w),
            lit(0d), (acc, x) => acc + x), 6) + lit(0d))
    }
    out.drop("__e")
  }
}

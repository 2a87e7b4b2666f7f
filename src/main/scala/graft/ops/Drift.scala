package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Distributional drift detection between two snapshots of a table — the
  * statistical complement to [[Profile.drift]]'s bounds-and-counts check.
  * Profile.drift answers "did the column's shape metadata move"; these
  * operators answer "did the DISTRIBUTION move, and by how much" — the
  * check a training-data pipeline runs between yesterday's corpus and
  * today's before re-training on it (covariate shift, upstream filter
  * breakage, a source going dark).
  *
  * Determinism contract (the engine-wide convention): every statistic is
  * computed in EXACT integer arithmetic — cumulative counts, cross-
  * multiplied numerators |cumA·nB − cumB·nA| instead of floating CDF
  * subtraction, ×2^20 fixed-point DECIMAL(38,0) sums for embeddings —
  * with at most one final double division per output value, so a DuckDB
  * replay is bit-identical regardless of shuffle or accumulation order.
  */
object Drift {

  /** Group-label ordering for the k-row driver folds — UTF-8 BYTE
    * order, matching DuckDB's default binary `ORDER BY` collation.
    * Scala's default String ordering compares UTF-16 code units, which
    * diverges from UTF-8 byte order for labels containing U+E000..
    * U+FFFF vs supplementary characters — and a different fold order
    * perturbs double-accumulation ULPs into a hash mismatch (round-15
    * ADVICE). ASCII labels (every current fixture) order identically
    * under both; this makes the contract hold for ANY label.
    */
  private[graft] val Utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var r = 0
    while (r == 0 && i < n) {
      r = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (r != 0) r else x.length - y.length
  }

  /** Two-sample Kolmogorov–Smirnov statistic between `a` and `b` on
    * numeric `valueCol`, exact: D = max_x |F_a(x) − F_b(x)| evaluated at
    * every observed value, carried as the INTEGER numerator
    * d_num = max_x |cumA(x)·nB − cumB(x)·nA| over denominator nA·nB.
    * Output is ONE row: (split_value, n_a, n_b, d_num, d) where
    * `split_value` is the smallest value attaining the maximum (the
    * natural "where did the distributions diverge most" cut point) and
    * d = d_num / (nA·nB) is the only double division. NULLs are ignored
    * (they have no position on the value axis).
    *
    * Shape at scale: per-value counts first (map-side-combined — the
    * shuffle carries one row per DISTINCT value per partition, not the
    * data), then a range-partitioned prefix sum: partial cumsums are
    * window aggregations WITHIN each range partition, and the
    * per-partition totals (one row per partition, collected — bounded by
    * the shuffle-partition count, the [[Layout]] offsets precedent) are
    * broadcast back as offsets. No global single-partition window, no
    * full sort on one executor — the classic distributed CDF.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val spark = a.sparkSession
    val ca = a.select(col(valueCol).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__na"))
    val cb = b.select(col(valueCol).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val n = spark.sessionState.conf.numShufflePartitions
    // persisted: the offset pass and the cumsum pass must observe the
    // SAME materialized range partitions (boundaries are sampled)
    val parts = graft.util.Caches.persist(
      merged.repartitionByRange(n, col("v"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("v")
    val local = parts
      .withColumn("__ca", sum("__na").over(w))
      .withColumn("__cb", sum("__nb").over(w))
    // per-partition totals: one row per partition — driver-side size is
    // the partition count, never the data
    val totals = parts.groupBy("__pid")
      .agg(sum("__na").as("ta"), sum("__nb").as("tb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offA = scala.collection.mutable.LongMap.empty[Long]
    val offB = scala.collection.mutable.LongMap.empty[Long]
    var (ra, rb) = (0L, 0L)
    totals.foreach { case (pid, ta, tb) =>
      offA(pid.toLong) = ra; offB(pid.toLong) = rb; ra += ta; rb += tb
    }
    val offDf = spark.createDataFrame(
      totals.map { case (pid, _, _) => Row(pid, offA(pid.toLong), offB(pid.toLong)) }
        .toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__oa", LongType, false), StructField("__ob", LongType, false))))
    // cross products in DECIMAL(38,0): cum·N overflows a long once each
    // side passes ~3e9 rows — the 100 TB case, not a corner
    val dec = "decimal(38,0)"
    val nA = lit(ra).cast(dec)
    val nB = lit(rb).cast(dec)
    val cum = local.join(broadcast(offDf), "__pid")
      .select(col("v"),
        ((col("__ca") + col("__oa")).cast(dec) * nB
          - (col("__cb") + col("__ob")).cast(dec) * nA).as("__raw"))
      .select(col("v"),
        when(col("__raw") < 0, -col("__raw")).otherwise(col("__raw"))
          .cast(dec).as("d_num"))
    // argmax with a total tie order: largest d_num, ties to the SMALLEST
    // value — max over (d_num, -v) on the double axis
    cum.agg(max(struct(col("d_num"),
        (-col("v").cast("double")).as("__negv"))).as("__m"))
      .select((-col("__m.__negv")).as("split_value"),
        lit(ra).as("n_a"), lit(rb).as("n_b"),
        // the argmax runs on the EXACT decimal; the reported numerator is
        // a double (a diagnostic — `d` is the statistic) so the output
        // schema carries no engine-specific decimal widening
        col("__m.d_num").cast("double").as("d_num"),
        (col("__m.d_num").cast("double")
          / lit(ra.toDouble * rb.toDouble)).as("d"))
  }

  /** [[ksStatistic]] with the asymptotic SIGNIFICANCE readout — the
    * two-sided p-value from the Kolmogorov distribution,
    * p = 2·Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²} with the effective-size scaling
    * λ = d·sqrt(nA·nB/(nA+nB)) (Smirnov's classic asymptotic; accurate
    * for effective n ≳ 35 — the regime every corpus-scale comparison is
    * in). The series is PINNED to 100 terms accumulated first-to-last
    * and clamped to [0, 1]: exp/pow doubles in a fixed order, so any
    * engine replays the p bit-for-bit (the no-erf convention that keeps
    * the z-statistics p-free does not bite here — K(λ) needs only exp).
    *
    * Degenerate regime, pinned: for λ < 0.04 the truncated series is
    * anti-conservative (at λ = 0 every term is ±1 and the 100-term sum
    * is exactly 0 — "maximal significance" for IDENTICAL distributions),
    * while the true p is indistinguishable from 1 (K(0.04) ≈ 0). So
    * λ < 0.04 short-circuits to p = 1.0 — the same convention Numerical
    * Recipes' probks uses when its series fails to converge. Above the
    * cut the 100-term truncation error is bounded by the first omitted
    * term e^(−2·101²·λ²) < 1e−13.
    *
    * Output: ksStatistic's row plus (lambda, p_value), still ONE row;
    * the scalar arithmetic happens on the one-row frame, nothing new
    * crosses the cluster.
    */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val base = ksStatistic(a, b, valueCol)
    val lam = col("d") * sqrt(col("n_a").cast("double")
      * col("n_b").cast("double")
      / (col("n_a") + col("n_b")).cast("double"))
    val series = (1 to 100).map { k =>
      val sign = if (k % 2 == 1) 1.0 else -1.0
      lit(sign) * exp(lit(-2.0 * k * k) * col("lambda") * col("lambda"))
    }.reduce(_ + _)
    base.withColumn("lambda", lam)
      .withColumn("p_value",
        when(col("lambda") < 0.04, lit(1d))
          .otherwise(
            round(least(lit(1d), greatest(lit(0d), lit(2d) * series)), 6)
              + lit(0d)))
      .withColumn("lambda", round(col("lambda"), 6) + lit(0d))
  }

  /** Per-(grp, v) cumulative __na/__nb sums over a merged count table
    * ordered by v within grp — the shared CDF pass of [[ksByGroup]] and
    * [[wassersteinByGroup]], with the SKEW GUARD (round 17): strata
    * whose distinct-value cardinality exceeds `maxGroupDistinct` would
    * serialize the per-group window on ONE partition, so they route
    * through the [[bhAdjust]]-style distributed form instead —
    * range-partition by (grp, v), window per (partition, grp), add
    * per-chunk offsets (one collected row per partition×oversized-
    * stratum). Cumulative sums are exact longs, so the two routes are
    * BIT-IDENTICAL (GroupedDriftSkewSpec pins it) and routing is
    * invisible to the oracle. `withNext` also carries the within-group
    * lead(v) (chunk boundaries stitched from the collected first-values
    * — the [[wasserstein1]] boundary-stitch idea). At most 64 oversized
    * strata (each costs one broadcast row per partition; more than that
    * means the grouping column is not a stratification — loud).
    */
  private[ops] def cumulativeByGroup(merged0: DataFrame, withNext: Boolean,
      maxGroupDistinct: Long): DataFrame = {
    val spark = merged0.sparkSession
    val merged = graft.util.Caches.persist(merged0)
    val big = merged.groupBy("grp").agg(count(lit(1)).as("__c"))
      .where(col("__c") > maxGroupDistinct)
      .select("grp").collect().map(_.getString(0)).sorted
    def windowed(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("grp").orderBy("v")
      val base = df.withColumn("__ca", sum("__na").over(w))
        .withColumn("__cb", sum("__nb").over(w))
      if (withNext) base.withColumn("__nextv", lead("v", 1).over(w))
      else base
    }
    if (big.isEmpty) windowed(merged)
    else {
      require(big.length <= 64, s"${big.length} strata exceed " +
        s"$maxGroupDistinct distinct values — the grouping column is " +
        "not a stratification; run the single-group statistic per slice")
      val small = windowed(merged.where(!col("grp").isin(big.toSeq: _*)))
      val n = spark.sessionState.conf.numShufflePartitions
      val parts = graft.util.Caches.persist(
        merged.where(col("grp").isin(big.toSeq: _*))
          .repartitionByRange(n, col("grp"), col("v"))
          .withColumn("__pid", spark_partition_id()))
      val lw = Window.partitionBy("__pid", "grp").orderBy("v")
      val local = parts
        .withColumn("__la", sum("__na").over(lw))
        .withColumn("__lb", sum("__nb").over(lw))
        .withColumn("__lnext", lead("v", 1).over(lw))
      // per-chunk totals + first value: ≤ partitions × |big| rows
      val chunks = parts.groupBy("__pid", "grp")
        .agg(sum("__na").as("ta"), sum("__nb").as("tb"),
          min("v").as("fv"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
        .sortBy(t => (t._2, t._1))
      val offRows = chunks.zipWithIndex.map { case ((pid, g, _, _, _), i) =>
        // offsets = totals of this grp's EARLIER chunks; boundary next
        // value = the next chunk's first v (same grp), else null
        val prev = chunks.take(i).filter(_._2 == g)
        val nextFv: java.lang.Double = chunks.drop(i + 1)
          .find(_._2 == g).map(c => java.lang.Double.valueOf(c._5)).orNull
        Row(pid, g, prev.map(_._3).sum, prev.map(_._4).sum, nextFv)
      }
      val offDf = spark.createDataFrame(offRows.toSeq.asJava,
        StructType(Seq(StructField("__pid", IntegerType, false),
          StructField("grp", StringType, false),
          StructField("__offa", LongType, false),
          StructField("__offb", LongType, false),
          StructField("__bnext", DoubleType, true))))
      val cols = Seq(col("grp"), col("v"), col("__na"), col("__nb"),
        (col("__la") + col("__offa")).as("__ca"),
        (col("__lb") + col("__offb")).as("__cb")) ++
        (if (withNext)
          Seq(coalesce(col("__lnext"), col("__bnext")).as("__nextv"))
        else Nil)
      small.unionByName(
        local.join(broadcast(offDf), Seq("__pid", "grp"))
          .select(cols: _*))
    }
  }

  /** Per-GROUP two-sample KS drift — the "WHICH stratum drifted"
    * readout ([[ksTest]] answers whether the corpus moved; this runs
    * one exact KS test per language/source/segment, the continuous
    * companion of [[proportionsBySegment]]): for every group, the
    * exact D = max|F_a − F_b| with the integer numerator convention of
    * [[ksStatistic]], plus the Smirnov λ and the 100-term Kolmogorov
    * p (the [[ksTest]] series, λ < 0.04 pinned to p = 1). Feed the p
    * column to [[bhAdjust]] before believing per-group flags.
    *
    * Groups present on ONE side only keep their row with NULL
    * split/d/λ/p (no comparison — loud, the [[proportionsBySegment]]
    * convention). Ties on d_num resolve to the smallest value.
    *
    * Shape at scale: per-(group, value) counts map-side combine the
    * data once; the cumulative pass is a PER-GROUP window for the
    * many-small-strata regime, and any stratum past `maxGroupDistinct`
    * distinct values routes through the distributed range-partitioned
    * form instead ([[cumulativeByGroup]], round-17 skew guard — a
    * 10⁸-distinct-value stratum no longer serializes one partition;
    * the two routes are bit-identical). Everything downstream is
    * group-cardinality work. Output per group:
    * (grp, n_a, n_b, split_value, d_num, d, lambda, p_value).
    */
  def ksByGroup(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, maxGroupDistinct: Long = 4000000L): DataFrame = {
    def cnt(df: DataFrame, n: String) = df
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as(n))
    val merged = cnt(a, "__na")
      .join(cnt(b, "__nb"), Seq("grp", "v"), "full_outer")
      .select(col("grp"), col("v"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val dec = "decimal(38,0)"
    val cum = cumulativeByGroup(merged, withNext = false,
      maxGroupDistinct)
    val totals = merged.groupBy("grp")
      .agg(sum("__na").as("__ta"), sum("__nb").as("__tb"))
    val raw = col("__ca").cast(dec) * col("__tb").cast(dec) -
      col("__cb").cast(dec) * col("__ta").cast(dec)
    val perG = cum.join(totals, "grp")
      .select(col("grp"), col("v"), col("__ta"), col("__tb"),
        when(raw < 0, -raw).otherwise(raw).cast(dec).as("__dnum"))
      .groupBy("grp")
      .agg(max("__ta").as("n_a"), max("__tb").as("n_b"),
        max(struct(col("__dnum"), (-col("v")).as("__negv"))).as("__m"))
    val tested = col("n_a") > 0 && col("n_b") > 0
    val d = col("__m.__dnum").cast("double") /
      (col("n_a").cast("double") * col("n_b").cast("double"))
    val lam = d * sqrt(col("n_a").cast("double")
      * col("n_b").cast("double")
      / (col("n_a") + col("n_b")).cast("double"))
    val base = perG.select(col("grp"), col("n_a"), col("n_b"),
      when(tested, -col("__m.__negv")).as("split_value"),
      when(tested, col("__m.__dnum").cast("double")).as("d_num"),
      when(tested, d).as("d"),
      when(tested, lam).as("lambda"))
    val series = (1 to 100).map { k =>
      val sign = if (k % 2 == 1) 1.0 else -1.0
      lit(sign) * exp(lit(-2.0 * k * k) * col("lambda") * col("lambda"))
    }.reduce(_ + _)
    base
      .withColumn("p_value",
        when(col("lambda").isNull, lit(null).cast("double"))
          .when(col("lambda") < 0.04, lit(1d))
          .otherwise(
            round(least(lit(1d), greatest(lit(0d), lit(2d) * series)), 6)
              + lit(0d)))
      .withColumn("lambda", round(col("lambda"), 6) + lit(0d))
  }

  /** Per-category frequency drift between two snapshots on categorical
    * `catCol` — the exact decomposition of total-variation distance.
    * Output per category (including categories present on one side
    * only): (category, n_a, n_b, share_a, share_b, l1_num, delta) where
    * l1_num = |n_a_c·nB − n_b_c·nA| is the exact integer numerator,
    * delta = l1_num / (nA·nB) its double value, and
    * TV(a,b) = Σ delta / 2. NULL categories form their own row (a source
    * starting to emit NULL types IS drift). Shares are single long/long
    * double divisions.
    *
    * Shape at scale: two map-side-combined grouped counts (shuffle
    * carries one partial per category per partition), one full-outer
    * join of those count tables — category-cardinality-sized — and a
    * broadcast of the two one-row totals. The data itself never
    * re-shuffles.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame,
      catCol: String): DataFrame = {
    val ca = a.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_b"))
    // join on the NULL-safe equality so a NULL category pairs its sides
    val joined = ca.join(cb, ca("category") <=> cb("category"), "full_outer")
      .select(coalesce(ca("category"), cb("category")).as("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    // DECIMAL(38,0) cross products: count·total overflows a long past
    // ~3e9 rows per side (same rationale as ksStatistic)
    val dec = "decimal(38,0)"
    val raw = col("n_a").cast(dec) * col("__tb").cast(dec) -
      col("n_b").cast(dec) * col("__ta").cast(dec)
    joined.crossJoin(broadcast(totals))
      .select(col("category"), col("n_a"), col("n_b"),
        (col("n_a").cast("double") / col("__ta")).as("share_a"),
        (col("n_b").cast("double") / col("__tb")).as("share_b"),
        // exact decimal internally; reported as double (delta is the
        // statistic) to keep the output schema decimal-free
        when(raw < 0, -raw).otherwise(raw).cast("double").as("l1_num"),
        (when(raw < 0, -raw).otherwise(raw).cast("double")
          / (col("__ta").cast("double") * col("__tb").cast("double")))
          .as("delta"))
  }

  /** Per-(label, dimension) embedding centroid drift between two corpus
    * snapshots — the embedding-space analogue of [[categoricalDrift]]:
    * did a class's mean vector move between yesterday's embedding run
    * and today's (model re-deploy, upstream preprocessing change,
    * population shift)? Input frames carry (vec_id, embedding, `labelCol`);
    * output per (label, d): (label, d, n_a, n_b, delta) with
    * delta = round(|sa/na − sb/nb| / 2^20, 6) — the ×2^20 fixed-point
    * DECIMAL(38,0) sums of [[Similarity.standardize]], order-insensitive
    * and engine-replayable, with one double division per side and one
    * final round. Labels present on only one side are dropped (no
    * centroid to compare).
    *
    * Shape at scale: one posexplode (narrow, dim-bounded) and ONE
    * map-side-combined groupBy (label, d) with conditional sums — the
    * shuffle carries label·dim partials, never vectors.
    */
  def centroidDrift(a: DataFrame, b: DataFrame,
      labelCol: String = "label"): DataFrame = {
    val scale = Similarity.FixedScale
    // the label keeps its NATIVE type end-to-end: nothing in the
    // algorithm needs a numeric label, and a silent cast("long") would
    // turn string labels ('en', 'spam') into NULL, collapsing every
    // class into one null-label centroid
    def expl(df: DataFrame, g: Int) =
      df.select(col(labelCol).as("label"),
          posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("label"), col("d"), lit(g).as("__g"),
          round(col("x").cast("double") * scale).cast("decimal(38,0)")
            .as("__fp"))
    val x = expl(a, 0).unionAll(expl(b, 1))
    val stats = x.groupBy("label", "d").agg(
      sum(when(col("__g") === 0, col("__fp"))).as("__sa"),
      sum(when(col("__g") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__g") === 1, col("__fp"))).as("__sb"),
      sum(when(col("__g") === 1, 1L).otherwise(0L)).as("n_b"))
    stats.where(col("n_a") > 0 && col("n_b") > 0)
      .select(col("label"), col("d"), col("n_a"), col("n_b"),
        round(abs(col("__sa").cast("double") / col("n_a")
          - col("__sb").cast("double") / col("n_b")) / scale, 6)
          .as("delta"))
  }

  /** Deterministic randomization test for a mean difference — "is
    * corpus A's score really higher than corpus B's, or is the gap
    * within relabeling noise?" The significance readout behind every
    * A/B comparison this engine produces (quality deltas between
    * snapshots, filter variants, annotation sources). Exact Welch/t
    * machinery needs distributional assumptions; the randomization test
    * needs none: re-draw the A/B labels `nPerms` times and ask how often
    * a relabeled split separates the means as far as the real one.
    *
    * DETERMINISTIC by the engine's hash contract: permutation p assigns
    * a row to side A iff h32raw(id ':' p ':' salt) < ⌊nA·2^32/n⌋ — the
    * draw happens in the PRE-modulo 32-bit domain, which is exactly
    * uniform, so the realized assignment rate equals nA/n to within
    * 2^-32 (the post-`% P` domain is non-uniform: values below
    * 2^32−4P are 25% likelier, which understates the null variance for
    * unbalanced designs and makes p-values anti-conservative). This is
    * Bernoulli(nA/n) relabeling, the standard scalable approximation of
    * exact-size permutation; a fresh `salt` redraws the whole family. Values fold as ×2^20 fixed-point longs, so every
    * permuted mean is exact up to one double division and any engine
    * replays the p-value bit-for-bit. A permutation that lands empty on
    * either side counts as extreme (conservative). NULL values are
    * excluded. p_value = (1 + #extreme) / (nPerms + 1), the add-one
    * permutation convention.
    *
    * Output is ONE row: (n_a, n_b, mean_a, mean_b, diff, n_perms,
    * n_extreme, p_value).
    *
    * Shape at scale: one bounded explode (nPerms copies of each value
    * row — nPerms is a knob in the hundreds) into ONE map-side-combined
    * per-permutation aggregate; the shuffle carries nPerms partials per
    * partition. The observed-stat row is the only driver collect
    * (one row — the AQE-statistics class).
    */
  def meanPermutationTest(a: DataFrame, b: DataFrame, idCol: String,
      valueCol: String, nPerms: Int = 200, salt: String = ""): DataFrame = {
    require(nPerms >= 1, s"nPerms must be >= 1, got $nPerms")
    import graft.functions.{TextFunctions => T}
    val scale = 1048576d
    def slim(df: DataFrame, tag: String) = df
      .where(col(valueCol).isNotNull)
      .select(
        concat(lit(tag), lit(":"), col(idCol).cast("string")).as("__id"),
        round(col(valueCol).cast("double") * scale).cast("long").as("__v"),
        lit(tag == "a").as("__ga"))
    val u = graft.util.Caches.persist(
      slim(a, "a").unionByName(slim(b, "b")))
    // one observed-statistic row to the driver (never data-sized)
    val base = u.agg(
      sum(when(col("__ga"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("__ga"), 1L).otherwise(0L)).as("nb"),
      sum(when(col("__ga"), col("__v")).otherwise(0L)).as("sa"),
      sum(when(!col("__ga"), col("__v")).otherwise(0L)).as("sb"))
      .collect().head
    val (nA, nB) = (base.getLong(0), base.getLong(1))
    require(nA > 0 && nB > 0,
      s"both sides need rows: n_a=$nA, n_b=$nB")
    val meanA = base.getLong(2).toDouble / nA / scale
    val meanB = base.getLong(3).toDouble / nB / scale
    val dObs = meanA - meanB
    // integer threshold ⌊nA·2^32/n⌋ over the RAW (pre-modulo, exactly
    // uniform) 32-bit hash domain — BigInt floor-div driver-side so nA
    // beyond 2^31 rows can't overflow the product; thr < 2^32 fits a long
    val thr = (BigInt(nA) * BigInt(2).pow(32) / BigInt(nA + nB)).toLong
    val perms = u
      .select(col("__id"), col("__v"),
        explode(sequence(lit(1), lit(nPerms))).as("__p"))
      .select(col("__p"), col("__v"),
        (T.h32raw(concat(col("__id"), lit(":"), col("__p").cast("string"),
          lit(":"), lit(salt))) < thr).as("__pa"))
      .groupBy("__p").agg(
        sum(when(col("__pa"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__pa"), 1L).otherwise(0L)).as("__nb"),
        sum(when(col("__pa"), col("__v")).otherwise(0L)).as("__sa"),
        sum(when(!col("__pa"), col("__v")).otherwise(0L)).as("__sb"))
    val extreme = perms.agg(
      coalesce(sum(when(col("__na") === 0 || col("__nb") === 0, 1L)
        .otherwise(when(
          abs(col("__sa").cast("double") / col("__na") / scale
            - col("__sb").cast("double") / col("__nb") / scale)
            >= lit(math.abs(dObs)), 1L).otherwise(0L))), lit(0L))
        .as("n_extreme"))
    extreme.select(lit(nA).as("n_a"), lit(nB).as("n_b"),
      (round(lit(meanA), 6) + lit(0d)).as("mean_a"),
      (round(lit(meanB), 6) + lit(0d)).as("mean_b"),
      (round(lit(dObs), 6) + lit(0d)).as("diff"),
      lit(nPerms.toLong).as("n_perms"), col("n_extreme"),
      round((col("n_extreme") + 1).cast("double") / lit(nPerms + 1d), 6)
        .as("p_value"))
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    * unit's experiment-period metric by its own pre-period baseline,
    * `y' = y − θ·(x − x̄)` with `θ = cov(x, y)/var(x)` pooled across all
    * units — the standard trick that shrinks A/B confidence intervals
    * ~30–70% when units have stable individual baselines, because
    * between-unit variance the treatment cannot touch is regressed out.
    * The readout companion to [[meanPermutationTest]]: run the
    * permutation test on the ADJUSTED means when the raw diff drowns in
    * between-user noise.
    *
    * Input: one row per unit with group, pre-period metric `preCol`
    * (x), experiment metric `postCol` (y). θ and x̄ come from the POOLED
    * frame (both groups — using per-group θ would re-introduce the bias
    * CUPED avoids). Output: one row per group with n, mean_pre, mean_post
    * and mean_adjusted; θ repeats on every row for the readout.
    *
    * Replay determinism: the five sufficient statistics accumulate as
    * ×2^20 fixed-point DECIMAL(38,0) sums — the [[Profile.correlation]]
    * convention, exact under any partitioning — and θ enters the
    * per-group adjustment through one-row broadcast, so no data-sized
    * driver state and no merge-order float drift. Same |x·y| ≲ 2^33
    * magnitude bound as correlation; winsorize first for wide metrics.
    */
  def cuped(df: DataFrame, groupCol: String, preCol: String,
      postCol: String): DataFrame = {
    val scale = (1L << 20).toDouble
    val x = col(preCol).cast("double"); val y = col(postCol).cast("double")
    def fp(c: org.apache.spark.sql.Column) =
      sum(round(c * scale).cast("decimal(38,0)"))
    val rows = df.where(x.isNotNull && y.isNotNull)
      .select(col(groupCol).as("group"), x.as("__x"), y.as("__y"))
    val pooled = rows.agg(count(lit(1)).as("__n"),
      fp(col("__x")).as("__sx"), fp(col("__y")).as("__sy"),
      fp(col("__x") * col("__x")).as("__sxx"),
      fp(col("__x") * col("__y")).as("__sxy"))
    def d(c: String) = col(c).cast("double") / scale
    val n = col("__n").cast("double")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val globals = pooled.select(
      when(varX > 0, (n * d("__sxy") - d("__sx") * d("__sy")) / varX)
        .otherwise(0d).as("__theta"),
      (d("__sx") / n).as("__xbar"))
    rows.crossJoin(broadcast(globals))
      .groupBy("group")
      .agg(count(lit(1)).as("n"),
        fp(col("__x")).as("__gsx"), fp(col("__y")).as("__gsy"),
        fp(col("__y") - col("__theta") * (col("__x") - col("__xbar")))
          .as("__gsa"),
        first(col("__theta")).as("__t"))
      .select(col("group"), col("n"),
        (round(d("__gsx") / col("n").cast("double"), 6) + lit(0d))
          .as("mean_pre"),
        (round(d("__gsy") / col("n").cast("double"), 6) + lit(0d))
          .as("mean_post"),
        (round(d("__gsa") / col("n").cast("double"), 6) + lit(0d))
          .as("mean_adjusted"),
        (round(col("__t"), 6) + lit(0d)).as("theta"))
  }

  /** Sample-ratio-mismatch (SRM) guard for randomized assignment: the
    * Pearson χ² goodness-of-fit of observed arm counts against the
    * DESIGNED split. A significant χ² means the randomizer, logging, or
    * a downstream filter is dropping units asymmetrically — the classic
    * silent A/B killer (Fabijan et al., KDD 2019 report ~6% of
    * experiments at scale trip it), and any treatment readout on top of
    * a mismatched denominator is invalid. Run it BEFORE
    * [[meanPermutationTest]] / [[cuped]]; a tripped SRM invalidates both.
    *
    * `expected` maps arm label → design weight (weights are normalized
    * internally, so 1:1 can be written {a→1, b→1}). Every designed arm
    * gets an output row even when observed count is zero (a vanished arm
    * is the most extreme mismatch); an OBSERVED arm missing from the
    * design gets a row with `expected_n` NULL and trips `srm` on every
    * row — there is no valid χ² against a zero-weight cell, and an
    * unexpected arm label is definitionally a bug. A ZERO-ROW input (or
    * one whose `groupCol` is entirely NULL) also trips `srm` on every
    * designed arm with `chi2` NULL — an experiment that logged no units
    * at all is the most extreme ratio mismatch, not a pass.
    *
    * Output: one row per arm `(group, n, expected_n, chi2_term, chi2,
    * dof, p_value, srm)` — `chi2`/`dof`/`p_value`/`srm` repeat on every
    * row for the readout; `srm` = (χ² > `chi2Threshold`) OR an
    * undesigned arm was observed. Caller picks the threshold from the
    * χ²(dof) table (3.841 for two arms at α=0.05); `p_value` (round 16)
    * is the exact χ²(dof) survival via
    * [[graft.functions.PValues.chiSqSurvivalCol]] — dof = designed
    * arms − 1 is a plan-time constant here, so the series unrolls
    * in-plan (NULL when the design has one arm or the input logged no
    * units).
    *
    * Replay determinism: arm counts are exact longs; each per-arm term
    * (n−e)²/e is one scalar double expression over exact integers
    * (identical IEEE evaluation on any engine), and the cross-arm sum
    * accumulates ×2^20 fixed-point longs — the [[cuped]] convention — so
    * the χ² replays bit-identically under any partitioning. Shape at
    * scale: one map-side-combined count per arm, then arm-cardinality
    * rows (a handful) through a one-row broadcast of the total.
    */
  def srmCheck(df: DataFrame, groupCol: String,
      expected: Map[String, Double], chi2Threshold: Double): DataFrame = {
    require(expected.nonEmpty, "expected arm weights must be non-empty")
    require(expected.values.forall(_ > 0),
      s"arm weights must be > 0, got $expected")
    val spark = df.sparkSession
    import spark.implicits._
    val wTotal = expected.values.sum
    val design = expected.toSeq.sortBy(_._1)
      .toDF("group", "__w")
      .select(col("group"), (col("__w") / wTotal).as("__share"))
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).as("n"))
    // full outer: designed-but-vanished arms stay (n=0), observed-but-
    // undesigned arms stay (expected NULL -> srm trips)
    val arms = design.join(counts, Seq("group"), "full_outer")
      .select(col("group"), coalesce(col("n"), lit(0L)).as("n"),
        col("__share"))
      .crossJoin(broadcast(df.where(col(groupCol).isNotNull)
        .agg(count(lit(1)).as("__total"))))
    val e = col("__share") * col("__total").cast("double")
    val term = (col("n").cast("double") - e) * (col("n").cast("double") - e) / e
    val scale = (1L << 20).toDouble
    // total==0 would make every term 0/0 = NaN (→ 0L in the fixed-point
    // sum): an experiment that logged NO units would silently PASS the
    // guard. Terms go NULL instead (chi2 reads NULL) and srm forces true.
    val withTerm = arms.select(col("group"), col("n"), col("__total"),
      col("__share"),
      when(col("__share").isNotNull && col("__total") > 0, e).as("__e"),
      when(col("__share").isNotNull && col("__total") > 0, term)
        .as("__term"))
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // dof is a PLAN-TIME constant (designed arms − 1), so the ANY-dof
    // χ² survival p unrolls as an in-plan expression (round 16); a NULL
    // chi2fp (zero-total input) propagates to a NULL p
    val dofStatic = expected.size - 1
    // the isNotNull guard matters: Spark least/greatest SKIP nulls, so
    // the kernel's clamp would turn a NULL chi2 (zero-total input) into
    // p = 0.0 — "infinitely significant" — instead of NULL
    val pCol = if (dofStatic >= 1)
      when(col("__chi2fp").isNotNull,
        round(graft.functions.PValues.chiSqSurvivalCol(
          col("__chi2fp").cast("double") / scale, dofStatic), 6) + lit(0d))
    else lit(null).cast("double")
    withTerm
      .withColumn("__chi2fp",
        sum(round(col("__term") * scale).cast("long")).over(w))
      .withColumn("__undesigned",
        max(when(col("__share").isNull, 1).otherwise(0)).over(w))
      .withColumn("__dof",
        sum(when(col("__share").isNotNull, 1L).otherwise(0L)).over(w) - 1L)
      .select(col("group"), col("n"),
        (round(col("__e"), 6) + lit(0d)).as("expected_n"),
        (round(col("__term"), 6) + lit(0d)).as("chi2_term"),
        (round(col("__chi2fp").cast("double") / scale, 6) + lit(0d))
          .as("chi2"),
        col("__dof").as("dof"),
        pCol.as("p_value"),
        (coalesce(col("__chi2fp").cast("double") / scale, lit(0d))
          > chi2Threshold
          || col("__undesigned") === 1 || col("__total") === 0).as("srm"))
  }

  /** Spearman rank correlation ρ between two numeric columns — the
    * monotone-association readout [[Profile.correlation]]'s Pearson r
    * cannot give (r sees only LINEAR association and melts under
    * outliers; ρ is Pearson over MIDRANKS, so any monotone relationship
    * scores ±1 and a single extreme row moves it by at most one rank).
    * The rank-based completion of the drift statistics toolbox next to
    * [[mannWhitney]].
    *
    * Midranks per column via the [[ksStatistic]] distributed CDF — per-
    * value counts, range-partitioned cumulative sums with per-partition
    * offsets, NO global window: mr(v) = cumBelow(v) + (count(v) + 1)/2.
    * Ranks join back to rows on the value key, and ρ is the engine's
    * exact fixed-point Pearson over (mr_x, mr_y) (midranks are exact
    * halves, exact on the ×2^20 grid). Output ONE row: (n, rho).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val slim = graft.util.Caches.persist(
      df.select(col(xCol).cast("double").as("__x"),
          col(yCol).cast("double").as("__y"))
        .where(col("__x").isNotNull && col("__y").isNotNull))

    // (value, midrank) table for one column — the ksStatistic CDF shape
    def midranks(c: String): DataFrame = {
      val counts = slim.groupBy(col(c).as("v")).agg(count(lit(1)).as("__k"))
      val n = spark.sessionState.conf.numShufflePartitions
      val parts = graft.util.Caches.persist(
        counts.repartitionByRange(n, col("v"))
          .withColumn("__pid", spark_partition_id()))
      val w = Window.partitionBy("__pid").orderBy("v")
      val local = parts.withColumn("__ck", sum("__k").over(w))
      val totals = parts.groupBy("__pid").agg(sum("__k").as("t"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var run = 0L
      val offRows = totals.map { case (pid, t) =>
        val r = Row(pid, run); run += t; r
      }
      val offDf = spark.createDataFrame(offRows.toSeq.asJava,
        StructType(Seq(StructField("__pid", IntegerType, false),
          StructField("__off", LongType, false))))
      local.join(broadcast(offDf), "__pid")
        .select(col("v"),
          ((col("__ck") + col("__off") - col("__k")).cast("double")
            + (col("__k").cast("double") + 1) / 2).as("mr"))
    }
    val ranked = slim
      .join(midranks("__x").withColumnRenamed("v", "__x")
        .withColumnRenamed("mr", "__rx"), "__x")
      .join(midranks("__y").withColumnRenamed("v", "__y")
        .withColumnRenamed("mr", "__ry"), "__y")
      .withColumn("__g", lit(0))
    Profile.correlation(ranked, "__rx", "__ry", Seq("__g"))
      .select(col("n"), col("corr").as("rho"))
  }

  /** Wilcoxon SIGNED-RANK test over paired observations — the paired
    * counterpart of [[mannWhitney]] (same unit measured twice:
    * before/after an experiment, two annotators, two model versions on
    * the same prompts): rank |after − before| across units, W+ = the
    * rank sum of the positive differences. Outlier-immune like every
    * rank statistic, and sensitive to consistent per-unit direction the
    * unpaired tests dilute.
    *
    * Conventions pinned for replay: zero differences DROP (the classic
    * Wilcoxon treatment), tied |d| take MIDRANKS, and
    * z = (W+ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − ΣT/48) with
    * ΣT = Σ_ties (t³ − t), no continuity correction — 2·W+ and ΣT are
    * exact integers (DECIMAL(38,0) sums), z one pinned-order double.
    * Differences quantize ×2^20 before ranking so the tie structure
    * itself is engine-exact. Midranks come from the [[ksStatistic]]
    * distributed CDF (no global window). `p_value` = two-sided normal
    * erfc(|z|/√2) from the unrounded z (round 16, the
    * [[graft.functions.PValues]] pinned kernel).
    *
    * Output ONE row: (n_pairs, n_nonzero, w_plus, w_minus, z, p_value).
    */
  def wilcoxonSignedRank(df: DataFrame, beforeCol: String,
      afterCol: String): DataFrame = {
    val spark = df.sparkSession
    val scale = 1048576d
    val d = graft.util.Caches.persist(
      df.where(col(beforeCol).isNotNull && col(afterCol).isNotNull)
        .select((round(col(afterCol).cast("double") * scale).cast("long")
          - round(col(beforeCol).cast("double") * scale).cast("long"))
          .as("__d")))
    val nPairs = d.count()
    val nz = d.where(col("__d") =!= 0L)
      .select(abs(col("__d")).as("__a"), (col("__d") > 0).as("__pos"))
    val counts = nz.groupBy("__a")
      .agg(count(lit(1)).as("__k"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__kp"))
    val n = spark.sessionState.conf.numShufflePartitions
    val parts = graft.util.Caches.persist(
      counts.repartitionByRange(n, col("__a"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("__a")
    val local = parts.withColumn("__ck", sum("__k").over(w))
    val totals = parts.groupBy("__pid").agg(sum("__k").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var run = 0L
    val offRows = totals.map { case (pid, t) =>
      val r = Row(pid, run); run += t; r
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__off", LongType, false))))
    val dec = "decimal(38,0)"
    // 2·midrank(a) = 2·cumExcl + k + 1 (exact integer); W+ sums the
    // positive-side counts times it
    val agg = local.join(broadcast(offDf), "__pid")
      .select(col("__k"), col("__kp"),
        (col("__ck") + col("__off") - col("__k")).as("__cx"))
      .agg(
        sum("__k").as("nz"),
        sum(col("__kp").cast(dec)
          * (col("__cx").cast(dec) * 2 + col("__k").cast(dec) + 1))
          .as("w2p"),
        sum({
          val t = col("__k").cast(dec)
          t * t * t - t
        }).as("tie"))
      .collect().head
    val nNz = Option(agg.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    require(nNz > 0, "all paired differences are zero — nothing to rank")
    val wPlus = agg.getDecimal(1).doubleValue() / 2
    val tieSum = agg.getDecimal(2).doubleValue()
    val nn = nNz.toDouble
    val mu = nn * (nn + 1) / 4.0
    val varW = nn * (nn + 1) * (2 * nn + 1) / 24.0 - tieSum / 48.0
    val z = if (varW > 0) (wPlus - mu) / math.sqrt(varW) else 0.0
    val pv = graft.functions.PValues.round6(
      graft.functions.PValues.pTwoSidedZ(z))
    import spark.implicits._
    Seq((nPairs, nNz, wPlus, nn * (nn + 1) / 2.0 - wPlus,
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0, pv))
      .toDF("n_pairs", "n_nonzero", "w_plus", "w_minus", "z", "p_value")
  }

  /** Pearson χ² test of INDEPENDENCE between two categorical columns —
    * the association sibling of [[srmCheck]]'s goodness-of-fit: srm asks
    * "do observed arm counts match a designed split"; this asks "are two
    * observed categoricals related at all" (source × language, template
    * × label, arm × outcome — the first question on any contingency
    * readout). χ² = Σ_cells (o − e)²/e with e = row·col/total, dof =
    * (r−1)(c−1), plus Cramér's V = sqrt(χ²/(n·min(r−1, c−1))) — the
    * [0,1] effect size a raw χ² (which grows with n) cannot give.
    *
    * Replay determinism (the [[srmCheck]] conventions): cell/margin
    * counts are exact longs; each per-cell term is one scalar double
    * expression over exact integers; the cross-cell sum accumulates
    * ×2^20 fixed-point longs. NULL categories are their own level
    * ("(null)") — missingness is usually the association. Output is ONE
    * row: (n, n_rows_x, n_cols_y, chi2, dof, cramers_v, p_value), the
    * p (round 16) the ANY-dof χ² survival of
    * [[graft.functions.PValues.chiSqSurvival]] computed from the exact
    * chi2fp/2^20 double (NULL when dof = 0 — a constant column admits
    * no test); the oracle replays the identical unrolled series
    * generated at dump time from the observed dof.
    *
    * Shape at scale: one map-side-combined (x, y) cell count (output =
    * occupied cells, never data), margins re-aggregated from the cells,
    * margins broadcast back — cell-cardinality work end to end; the
    * single readout row finishes on the driver (the [[kruskalWallis]]
    * convention).
    */
  def chiSquareIndependence(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val occupied = graft.util.Caches.persist(
      df.select(
          coalesce(col(xCol).cast("string"), lit("(null)")).as("__x"),
          coalesce(col(yCol).cast("string"), lit("(null)")).as("__y"))
        .groupBy("__x", "__y").agg(count(lit(1)).as("__o")))
    val rows = occupied.groupBy("__x").agg(sum("__o").as("__rx"))
    val cols_ = occupied.groupBy("__y").agg(sum("__o").as("__cy"))
    val tot = occupied.agg(sum("__o").as("__n"),
      count_distinct(col("__x")).as("__r"),
      count_distinct(col("__y")).as("__c"))
    // EMPTY cells contribute (0 − e)²/e = e — the full r×c grid (margin
    // cross join; grid cardinality = category cardinalities, never data)
    val cells = rows.crossJoin(cols_)
      .join(occupied, Seq("__x", "__y"), "left")
      .select(col("__x"), col("__y"), col("__rx"), col("__cy"),
        coalesce(col("__o"), lit(0L)).as("__o"))
    val scale = (1L << 20).toDouble
    val e = col("__rx").cast("double") * col("__cy").cast("double") /
      col("__n").cast("double")
    val term = (col("__o").cast("double") - e) *
      (col("__o").cast("double") - e) / e
    val agg = cells
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__r"), col("__c"),
        round(term * scale).cast("long").as("__t"))
      .groupBy("__n", "__r", "__c")
      .agg(sum("__t").as("__chi2fp"))
      .collect()
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("n", LongType, false),
      StructField("n_rows_x", LongType, false),
      StructField("n_cols_y", LongType, false),
      StructField("chi2", DoubleType, false),
      StructField("dof", LongType, false),
      StructField("cramers_v", DoubleType, true),
      StructField("p_value", DoubleType, true)))
    // the readout is ONE row (or zero on empty input) — the driver-side
    // finish is the kruskalWallis convention and unlocks the ANY-dof
    // survival p (dof is runtime here; the series length depends on it)
    val outRows = agg.map { r =>
      val (n, rr, cc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val chi2Raw = r.getLong(3).toDouble / scale // /2^20: exact double
      val dof = (rr - 1) * (cc - 1)
      val r6 = graft.functions.PValues.round6 _
      val cv: java.lang.Double = if (rr > 1 && cc > 1)
        r6(math.sqrt(chi2Raw
          / (n.toDouble * math.min(rr - 1, cc - 1).toDouble)))
      else null
      val pv: java.lang.Double = if (dof >= 1)
        r6(graft.functions.PValues.chiSqSurvival(chi2Raw, dof.toInt))
      else null
      Row(n, rr, cc, r6(chi2Raw), dof, cv, pv)
    }
    spark.createDataFrame(outRows.toSeq.asJava, schema)
  }

  /** Exact Mann–Whitney U (Wilcoxon rank-sum) between `a` and `b` on
    * `valueCol` — the rank-based two-sample test that completes the
    * drift toolbox: [[ksStatistic]] is sensitive to ANY distributional
    * difference, the U test specifically to stochastic ordering
    * ("does A tend to exceed B"), and unlike [[meanPermutationTest]] it
    * is outlier-immune (ranks, not values).
    *
    * EXACT INTEGER statistic with midrank tie handling:
    * 2·U_A = Σ_v nA(v)·(2·cumB(<v) + nB(v)) over distinct values v —
    * each A observation counts B observations below it twice and ties
    * once. The tie-corrected normal approximation rides along:
    * z = (U_A − nA·nB/2) / sqrt(nA·nB/12 · ((n+1) − ΣT/(n(n−1)))) with
    * ΣT = Σ_ties (t³ − t), every sum exact in DECIMAL(38,0) before the
    * pinned-order final doubles (no continuity correction — pinned
    * convention, stated here so the z replays bit-for-bit).
    *
    * Decision readouts (round 16): `p_value` = two-sided normal
    * erfc(|z|/√2) via the [[graft.functions.PValues]] pinned kernel
    * (computed from the UNROUNDED z), and `delta` = Cliff's delta
    * 2U_A/(n_A·n_B) − 1 ∈ [−1, 1] — the rank-biserial effect size (p
    * grows with n; δ does not — the η²-next-to-F convention of
    * [[anovaF]]).
    *
    * Shape at scale: per-value counts (map-side combined), ONE
    * range-partitioned cumulative sum with per-partition offsets (the
    * [[ksStatistic]] distributed CDF — no global window), and one-row
    * exact aggregates. Output ONE row:
    * (n_a, n_b, u_a, u_b, z, p_value, delta).
    */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val spark = a.sparkSession
    val ca = a.select(col(valueCol).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__na"))
    val cb = b.select(col(valueCol).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val n = spark.sessionState.conf.numShufflePartitions
    val parts = graft.util.Caches.persist(
      merged.repartitionByRange(n, col("v"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("v")
    val local = parts.withColumn("__cb", sum("__nb").over(w))
    val totals = parts.groupBy("__pid").agg(sum("__nb").as("tb"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var rb = 0L
    val offRows = totals.map { case (pid, tb) =>
      val r = Row(pid, rb); rb += tb; r
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__ob", LongType, false))))
    val dec = "decimal(38,0)"
    val agg = local.join(broadcast(offDf), "__pid")
      .select(col("__na"), col("__nb"),
        // cumB STRICTLY BELOW v: the running sum minus v's own count
        (col("__cb") + col("__ob") - col("__nb")).as("__cbx"))
      .agg(
        sum(col("__na")).as("na"),
        sum(col("__nb")).as("nb"),
        sum(col("__na").cast(dec)
          * (col("__cbx").cast(dec) * 2 + col("__nb").cast(dec)))
          .as("u2"),
        sum({
          val t = (col("__na") + col("__nb")).cast(dec)
          t * t * t - t
        }).as("tie"))
      .collect().head
    val (nA, nB) = (agg.getLong(0), agg.getLong(1))
    require(nA > 0 && nB > 0, s"both sides need rows: n_a=$nA, n_b=$nB")
    val uA = agg.getDecimal(2).doubleValue() / 2
    val tieSum = agg.getDecimal(3).doubleValue()
    val nn = (nA + nB).toDouble
    val varU =
      nA.toDouble * nB / 12.0 * ((nn + 1) - tieSum / (nn * (nn - 1)))
    val mu = nA.toDouble * nB / 2.0
    val z = if (varU > 0) (uA - mu) / math.sqrt(varU) else 0.0
    val pv = graft.functions.PValues.round6(
      graft.functions.PValues.pTwoSidedZ(z))
    val delta = (2.0 * uA) / (nA.toDouble * nB.toDouble) - 1.0
    import spark.implicits._
    Seq((nA, nB, uA, nA.toDouble * nB - uA,
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0, pv,
      BigDecimal(delta).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0))
      .toDF("n_a", "n_b", "u_a", "u_b", "z", "p_value", "delta")
  }

  /** Kruskal–Wallis H — the k-sample generalization of [[mannWhitney]]
    * for MULTI-ARM experiments (3+ variants, source cohorts, model
    * versions): are the k groups' value distributions stochastically
    * ordered the same? Rank all values jointly with midrank ties,
    * H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1), tie-corrected by
    * 1 − ΣT/(N³−N) with ΣT = Σ_ties (t³−t); under H₀, H ~ χ²(k−1).
    *
    * Determinism contract: per-(group, value) and per-value counts are
    * exact longs; 2·R_g = Σ_v c_g(v)·(2·cumBelow(v) + k_v + 1) and ΣT
    * are exact DECIMAL(38,0) sums; the k-term fold Σ R_g²/n_g runs in
    * GROUP-LABEL-ASC order on the driver (UTF-8 byte order — DuckDB's
    * binary collation; k = arm count, bounded), and H is one
    * pinned-order double expression. The χ²(k−1) SIGNIFICANCE rides
    * along for ANY dof (round 16): even dof takes the closed Erlang
    * form p = e^(−H/2)·Σ_{j<dof/2} (H/2)^j/j! — terms by the pinned
    * recurrence term_j = term_{j−1}·x/j accumulated first-to-last,
    * clamped to [0,1] (the [[ksTest]] series convention) — and odd dof
    * the erfc + half-integer-gamma series of
    * [[graft.functions.PValues.chiSqSurvival]]; the oracle replays the
    * identical unrolled arithmetic generated at dump time from the
    * OBSERVED arm count (no hardcoded dof arms).
    *
    * Shape at scale: one map-side-combined (group, value) count, one
    * range-partitioned cumulative sum with per-partition offsets (the
    * [[ksStatistic]] distributed CDF — no global window), one
    * group-cardinality aggregate. Only k rows ever reach the driver.
    * Output one row per group, (grp, n, rank_sum, mean_rank) plus the
    * repeated (h, dof, p_value) readout, ordered by grp.
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val gv = graft.util.Caches.persist(
      df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
        .select(col(groupCol).cast("string").as("__g"),
          col(valueCol).cast("double").as("v"))
        .groupBy("__g", "v").agg(count(lit(1)).as("__c")))
    val vc = gv.groupBy("v").agg(sum("__c").as("__k"))
    val n = spark.sessionState.conf.numShufflePartitions
    val parts = graft.util.Caches.persist(
      vc.repartitionByRange(n, col("v"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("v")
    val local = parts.withColumn("__ck", sum("__k").over(w))
    val totals = parts.groupBy("__pid").agg(sum("__k").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var run = 0L
    val offRows = totals.map { case (pid, t) =>
      val r = Row(pid, run); run += t; r
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__off", LongType, false))))
    val dec = "decimal(38,0)"
    val cdf = local.join(broadcast(offDf), "__pid")
      .select(col("v"), col("__k"),
        (col("__ck") + col("__off") - col("__k")).as("__cx"))
    // per-group exact rank sums: 2·R_g (exact halves stay exact)
    val perGroup = gv.join(cdf, "v")
      .groupBy("__g")
      .agg(sum("__c").as("n"),
        sum(col("__c").cast(dec)
          * (col("__cx").cast(dec) * 2 + col("__k").cast(dec) + 1))
          .as("r2"))
      .collect().sortBy(_.getString(0))(Utf8Order)
    require(perGroup.length >= 2,
      s"kruskalWallis needs >= 2 groups, got ${perGroup.length}")
    val tieRow = cdf.agg(sum({
      val t = col("__k").cast(dec)
      t * t * t - t
    }).as("tie")).collect().head
    val bigN = perGroup.map(_.getLong(1)).sum
    val nn = bigN.toDouble
    var s = 0.0
    perGroup.foreach { r =>
      val rg = r.getDecimal(2).doubleValue() / 2.0
      s += rg * rg / r.getLong(1).toDouble
    }
    val h0 = 12.0 / (nn * (nn + 1.0)) * s - 3.0 * (nn + 1.0)
    val corr = 1.0 - tieRow.getDecimal(0).doubleValue() /
      (nn * nn * nn - nn)
    val h = if (corr > 0) h0 / corr else h0
    val dof = perGroup.length - 1
    // ANY dof (round 16): the even-dof Erlang closed form and the
    // odd-dof erfc + half-gamma series, both pinned-order in
    // [[graft.functions.PValues.chiSqSurvival]] and replayed from the
    // same unrolled arithmetic in the oracle
    val p: java.lang.Double = graft.functions.PValues.round6(
      graft.functions.PValues.chiSqSurvival(h, dof))
    val hOut = BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0
    val outRows = perGroup.map { r =>
      val ng = r.getLong(1)
      val rankSum = r.getDecimal(2).doubleValue() / 2.0
      Row(r.getString(0), ng, rankSum,
        BigDecimal(rankSum / ng.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0,
        hOut, dof.toLong, p)
    }
    spark.createDataFrame(outRows.toSeq.asJava,
      StructType(Seq(StructField("grp", StringType, false),
        StructField("n", LongType, false),
        StructField("rank_sum", DoubleType, false),
        StructField("mean_rank", DoubleType, false),
        StructField("h", DoubleType, false),
        StructField("dof", LongType, false),
        StructField("p_value", DoubleType, true))))
  }

  /** Log-factorial prefix table on the ×2^20 fixed-point grid:
    * lf(i) = Σ_{j≤i} ln j accumulated first-to-last in doubles with
    * StrictMath.log (bit-reproducible across JVMs and CPUs — the
    * intrinsified Math.log is allowed platform-varying 1-ULP error),
    * each PREFIX snapped to a long. [[fisherExact]] combines these
    * longs with EXACT integer arithmetic, so the hypergeometric
    * log-pmf comparisons — which k's enter the two-sided sum — are
    * integer-exact and engine-replayable: the oracle receives this
    * table verbatim as list literals.
    */
  private[graft] def logFactFp(n: Int): Array[Long] = {
    val out = new Array[Long](n + 1)
    var acc = 0.0
    var i = 1
    while (i <= n) {
      acc += java.lang.StrictMath.log(i.toDouble)
      out(i) = math.round(acc * 1048576d)
      i += 1
    }
    out
  }

  /** Fisher's EXACT test on a 2×2 contingency of two boolean columns —
    * the valid small-count companion to [[chiSquareIndependence]]
    * (whose χ² approximation needs every expected cell ≳ 5; rare-event
    * arms in an A/B readout routinely violate that): the two-sided p is
    * the exact hypergeometric tail, p = Σ pmf(k) over every table k
    * (same margins) at most as probable as the observed one.
    *
    * Determinism contract: cell counts are exact longs; log-pmfs are
    * EXACT INTEGER combinations of the ×2^20 [[logFactFp]] prefix
    * table, lp(k) = lf(r1)+lf(r2)+lf(c1)+lf(c2)−lf(n)−lf(k)−lf(r1−k)
    * −lf(c1−k)−lf(r2−c1+k), so the inclusion rule lp(k) ≤ lp(a_obs) is
    * an integer comparison — NO epsilon tie-break (scipy's 1+1e-7
    * relative gate exists because it compares raw doubles; the
    * fixed-point grid makes ties exact). The sum accumulates
    * exp(lp/2^20) in ascending-k order (StrictMath.exp — the plan/
    * driver parity convention), clamps to ≤ 1, rounds 6dp. The oracle
    * replays the identical table from dump-time literals.
    *
    * Shape at scale: the 100 TB part is ONE map-side-combined pass of
    * four conditional sums (the data never shuffles; one row reaches
    * the driver); the test itself is O(min margin) driver arithmetic.
    * `maxN` guards the O(n) table: beyond ~1e6 units the expected-cell
    * condition that motivates Fisher over χ² cannot bind — use
    * [[chiSquareIndependence]] there (loud, not silent).
    *
    * Output ONE row: (n, n11, n12, n21, n22, odds_ratio, p_value) with
    * odds_ratio = ad/bc (NULL when bc = 0 — infinite or undefined).
    */
  def fisherExact(df: DataFrame, xCol: String, yCol: String,
      maxN: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    val slim = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("boolean").as("__x"),
        col(yCol).cast("boolean").as("__y"))
    val cells = slim.agg(
      coalesce(sum(when(col("__x") && col("__y"), 1L).otherwise(0L)),
        lit(0L)).as("a"),
      coalesce(sum(when(col("__x") && !col("__y"), 1L).otherwise(0L)),
        lit(0L)).as("b"),
      coalesce(sum(when(!col("__x") && col("__y"), 1L).otherwise(0L)),
        lit(0L)).as("c"),
      coalesce(sum(when(!col("__x") && !col("__y"), 1L).otherwise(0L)),
        lit(0L)).as("d")).collect().head
    val (a, b, c, d) =
      (cells.getLong(0), cells.getLong(1), cells.getLong(2),
        cells.getLong(3))
    val n = a + b + c + d
    require(n >= 1, "fisherExact needs at least one non-null unit")
    require(n <= maxN,
      s"fisherExact is the small-count test (n = $n > maxN = $maxN) — " +
        "use chiSquareIndependence at this scale")
    val (r1, r2, c1, c2) = (a + b, c + d, a + c, b + d)
    val lf = logFactFp(n.toInt)
    def lp(k: Long): Long =
      lf(r1.toInt) + lf(r2.toInt) + lf(c1.toInt) + lf(c2.toInt) -
        lf(n.toInt) - lf(k.toInt) - lf((r1 - k).toInt) -
        lf((c1 - k).toInt) - lf((r2 - c1 + k).toInt)
    val kLo = math.max(0L, c1 - r2)
    val kHi = math.min(r1, c1)
    val lpObs = lp(a)
    var acc = 0.0
    var k = kLo
    while (k <= kHi) {
      val v = lp(k)
      if (v <= lpObs)
        acc = acc + java.lang.StrictMath.exp(v.toDouble / 1048576.0)
      k += 1
    }
    val r6 = graft.functions.PValues.round6 _
    val p = r6(math.min(1.0, acc))
    val or: java.lang.Double =
      if (b > 0 && c > 0)
        r6((a.toDouble * d.toDouble) / (b.toDouble * c.toDouble))
      else null
    spark.createDataFrame(
      Seq(Row(n, a, b, c, d, or, p)).asJava,
      StructType(Seq(
        StructField("n", LongType, false),
        StructField("n11", LongType, false),
        StructField("n12", LongType, false),
        StructField("n21", LongType, false),
        StructField("n22", LongType, false),
        StructField("odds_ratio", DoubleType, true),
        StructField("p_value", DoubleType, false))))
  }

  /** Two-proportion z-test — the CONVERSION-RATE comparison every A/B
    * readout starts with (purchase rate, click-through, filter pass
    * rate): z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with the POOLED
    * p̂ (the H₀-consistent standard error), two-sided p = erfc(|z|/√2)
    * via the [[graft.functions.PValues]] pinned kernel, and the
    * effect-size columns a raw z cannot give: the absolute lift
    * p̂_a − p̂_b and the relative lift (p̂_a − p̂_b)/p̂_b (NULL when
    * p̂_b = 0).
    *
    * Each arm also gets its WILSON score interval at the `ciZ` critical
    * point (default 1.959964, the two-sided 5% z) — the small-k-safe
    * interval (the naive Wald CI collapses to width 0 at p̂ ∈ {0, 1};
    * Wilson stays honest), so the readout is plottable as
    * rate ± interval per arm, not just one p.
    *
    * `df` carries one row per unit with boolean `successCol` (NULL
    * units drop — not exposed, not converted) and arm labels in
    * `groupCol`; `armA`/`armB` name the two arms to compare (extra
    * arms are ignored — run per pair). Determinism: counts are exact
    * longs; z and the Wilson bounds are pinned-order double expressions
    * over them; a degenerate pooled p̂ ∈ {0, 1} (no variance) pins
    * z = 0, p = 1.
    *
    * Shape at scale: one map-side-combined conditional-count pass — the
    * data never shuffles, two rows reach the driver. Output ONE row:
    * (n_a, n_b, k_a, k_b, rate_a, rate_b, ci_a_lo, ci_a_hi, ci_b_lo,
    * ci_b_hi, lift, lift_rel, z, p_value).
    */
  def proportionsZ(df: DataFrame, groupCol: String, successCol: String,
      armA: String, armB: String, ciZ: Double = 1.959964): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val spark = df.sparkSession
    val counts = df
      .where(col(groupCol).isNotNull && col(successCol).isNotNull
        && col(groupCol).cast("string").isin(armA, armB))
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol).cast("boolean"), 1L).otherwise(0L))
          .as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (na, ka) = counts.getOrElse(armA,
      throw new IllegalArgumentException(s"arm '$armA' has no rows"))
    val (nb, kb) = counts.getOrElse(armB,
      throw new IllegalArgumentException(s"arm '$armB' has no rows"))
    val ra = ka.toDouble / na.toDouble
    val rb = kb.toDouble / nb.toDouble
    val pool = (ka + kb).toDouble / (na + nb).toDouble
    val se2 = pool * (1.0 - pool) * (1.0 / na.toDouble + 1.0 / nb.toDouble)
    val z = if (se2 > 0) (ra - rb) / math.sqrt(se2) else 0.0
    val r6 = graft.functions.PValues.round6 _
    val pv = r6(graft.functions.PValues.pTwoSidedZ(z))
    val liftRel: java.lang.Double =
      if (rb > 0) r6((ra - rb) / rb) else null
    // Wilson score interval, pinned order (mirrored in the oracle)
    def wilson(p: Double, n: Long): (Double, Double) = {
      val z2 = ciZ * ciZ
      val nd = n.toDouble
      val denom = 1.0 + z2 / nd
      val center = (p + z2 / (2.0 * nd)) / denom
      val half = ciZ * math.sqrt(p * (1.0 - p) / nd
        + z2 / (4.0 * nd * nd)) / denom
      (center - half, center + half)
    }
    val (cal, cah) = wilson(ra, na)
    val (cbl, cbh) = wilson(rb, nb)
    spark.createDataFrame(
      Seq(Row(na, nb, ka, kb, r6(ra), r6(rb),
        r6(cal), r6(cah), r6(cbl), r6(cbh),
        r6(ra - rb), liftRel, r6(z), pv)).asJava,
      StructType(Seq(
        StructField("n_a", LongType, false),
        StructField("n_b", LongType, false),
        StructField("k_a", LongType, false),
        StructField("k_b", LongType, false),
        StructField("rate_a", DoubleType, false),
        StructField("rate_b", DoubleType, false),
        StructField("ci_a_lo", DoubleType, false),
        StructField("ci_a_hi", DoubleType, false),
        StructField("ci_b_lo", DoubleType, false),
        StructField("ci_b_hi", DoubleType, false),
        StructField("lift", DoubleType, false),
        StructField("lift_rel", DoubleType, true),
        StructField("z", DoubleType, false),
        StructField("p_value", DoubleType, false))))
  }

  /** Per-SEGMENT Welch t — the CONTINUOUS-metric sibling of
    * [[proportionsBySegment]] (round 17): one unequal-variance mean
    * comparison per segment (language, source, platform, time-of-day),
    * computed ENTIRELY in-plan so segment cardinality can be large —
    * exact ×2^20 fixed-point DECIMAL(38,0) moments per (segment, arm)
    * from ONE map-side-combined aggregate, then t, the
    * Welch–Satterthwaite dof, and the EXACT Student-t p as per-row
    * scalar expressions. The p runs through the native codegen'd
    * incomplete-beta expression ([[graft.functions.Expressions.IbetaReg]]
    * — the same pinned kernel [[welchT]] finishes on the driver), so
    * the whole readout stays inside WholeStageCodegen. Feed `p_t` to
    * [[bhAdjust]] before believing any per-segment flag (the
    * [[proportionsBySegment]] multiple-testing pairing).
    *
    * Segments where either arm has < 2 rows report NULL
    * t/dof/p (no comparison — kept, loud); zero pooled SE pins t = 0,
    * dof = 0, p = 1 (the [[welchT]] degenerate convention). Output per
    * segment: (segment, n_a, n_b, mean_a, mean_b, var_a, var_b, t,
    * dof, p_t).
    */
  def welchBySegment(df: DataFrame, segCol: String, groupCol: String,
      valueCol: String, armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val fp = 1048576d
    val dec = "decimal(38,0)"
    val zero = lit(0L).cast(dec)
    val slim = df.where(col(segCol).isNotNull && col(groupCol).isNotNull
        && col(valueCol).isNotNull
        && col(groupCol).cast("string").isin(armA, armB))
      .select(col(segCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === armA).as("__isA"),
        round(col(valueCol).cast("double") * fp).cast("long").cast(dec)
          .as("__fp"))
    val agg = slim.groupBy("segment").agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__isA"), col("__fp")).otherwise(zero)).as("__sa"),
      sum(when(col("__isA"), col("__fp") * col("__fp")).otherwise(zero))
        .as("__qa"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__isA"), col("__fp")).otherwise(zero)).as("__sb"),
      sum(when(!col("__isA"), col("__fp") * col("__fp")).otherwise(zero))
        .as("__qb"))
    // the welchT driver arithmetic, verbatim as scalar expressions
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val sa = col("__sa").cast("double") / lit(fp)
    val sb = col("__sb").cast("double") / lit(fp)
    val qa = col("__qa").cast("double") / lit(fp) / lit(fp)
    val qb = col("__qb").cast("double") / lit(fp) / lit(fp)
    val ma = sa / na
    val mb = sb / nb
    val va = (qa - sa * sa / na) / (na - lit(1.0))
    val vb = (qb - sb * sb / nb) / (nb - lit(1.0))
    val se2 = va / na + vb / nb
    val t = when(se2 > 0, (ma - mb) / sqrt(se2)).otherwise(lit(0.0))
    val dof = when(se2 > 0, se2 * se2 /
      ((va / na) * (va / na) / (na - lit(1.0))
        + (vb / nb) * (vb / nb) / (nb - lit(1.0)))).otherwise(lit(0.0))
    val valid = col("n_a") >= 2 && col("n_b") >= 2
    // pStudentT2's shapes: x = dof/(dof + t·t), a = dof/2, b = 1/2;
    // every division sits under a lazy when() (the ANSI convention)
    val pT = when(valid,
      when(dof > 0, graft.functions.PValues.ibetaRegCol(
        dof / (dof + t * t), dof / lit(2.0), lit(0.5)))
        .otherwise(lit(1.0)))
    agg.select(col("segment"), col("n_a"), col("n_b"),
      (round(when(col("n_a") > 0, ma), 6) + lit(0d)).as("mean_a"),
      (round(when(col("n_b") > 0, mb), 6) + lit(0d)).as("mean_b"),
      (round(when(col("n_a") >= 2, va), 6) + lit(0d)).as("var_a"),
      (round(when(col("n_b") >= 2, vb), 6) + lit(0d)).as("var_b"),
      (round(when(valid, t), 6) + lit(0d)).as("t"),
      (round(when(valid, dof), 6) + lit(0d)).as("dof"),
      (round(pT, 6) + lit(0d)).as("p_t"))
  }

  /** Hodges–Lehmann shift estimate + distribution-free CI — the
    * VALUE-UNITS effect size the rank family lacks (round 17):
    * [[mannWhitney]] reports p and Cliff's δ, but "how big is the
    * shift, in dollars" needs the HL estimator — the median of all
    * n_A·n_B pairwise differences a_i − b_j, the location shift the
    * rank-sum test actually tests, robust where the mean difference is
    * outlier-dominated. The CI is the Moses distribution-free interval
    * (Hollander–Wolfe convention, PINNED here): with N = n_A·n_B and
    * C = ciZ·√(n_A·n_B·(n_A+n_B+1)/12),
    *   k_lo = max(1, ⌊N/2 − C⌋), k_hi = min(N, N+1−k_lo),
    * the bounds are the k_lo-th and k_hi-th smallest pairwise
    * differences; the median is the average of the ⌊(N+1)/2⌋-th and
    * ⌊(N+2)/2⌋-th (equal ranks when N is odd).
    *
    * Shape at scale: pairwise differences materialize over the
    * DISTINCT-VALUE count tables, never the rows — |V_A|·|V_B| pair
    * rows each carrying weight n_a(v)·n_b(v') ([[TimeSeries.theilSen]]'s
    * pair-bounding argument), guarded LOUD at `maxPairs` (quantize the
    * value column — the gate rounds to integers — or read
    * [[mannWhitney]]'s δ instead when the value grid is unbounded).
    * Order statistics come from ONE distributed range-partitioned
    * cumulative-weight pass ([[cumulativeByGroup]]'s routed form — no
    * global window) with all four ranks selected in one aggregate.
    * Output ONE row: (n_a, n_b, n_pairs, hl_shift, ci_lo, ci_hi).
    */
  def hodgesLehmann(a: DataFrame, b: DataFrame, valueCol: String,
      ciZ: Double = 1.959964,
      maxPairs: Long = 16000000L): DataFrame = {
    require(ciZ > 0, s"ciZ must be > 0, got $ciZ")
    def cnt(df: DataFrame, vn: String, cn: String) =
      graft.util.Caches.persist(
        df.select(col(valueCol).cast("double").as(vn))
          .where(col(vn).isNotNull)
          .groupBy(vn).agg(count(lit(1)).as(cn)))
    val ca = cnt(a, "__va", "__wa")
    val cb = cnt(b, "__vb", "__wb")
    val (cardA, nA) = ca.agg(count(lit(1)), sum("__wa")).collect().head
      match { case r => (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)) }
    val (cardB, nB) = cb.agg(count(lit(1)), sum("__wb")).collect().head
      match { case r => (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)) }
    require(nA > 0 && nB > 0, "hodgesLehmann: a side has no non-null rows")
    require(cardA * cardB <= maxPairs,
      s"hodgesLehmann: $cardA x $cardB distinct values = ${cardA * cardB} " +
        s"pair rows > maxPairs $maxPairs — quantize the value column " +
        "(the gate rounds to integers) or read mannWhitney's delta")
    // maxPairs bounds DISTINCT-value cardinality only; the rank space
    // is nA·nB over ROW counts, which overflows Long when both sides
    // exceed ~3e9 rows — garbage k1/k2/kLo/kHi would silently select
    // wrong order statistics. Refuse loudly instead.
    val bigN =
      try Math.multiplyExact(nA, nB)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"hodgesLehmann: rank space $nA x $nB rows overflows Long — " +
            "sample each side below ~3e9 rows first (the HL estimate " +
            "is rank-based; a deterministic sample preserves it)")
      }
    val k1 = (bigN + 1) / 2
    val k2 = (bigN + 2) / 2
    val c = ciZ * math.sqrt(nA.toDouble * nB.toDouble *
      (nA + nB + 1).toDouble / 12.0)
    val kLo = math.max(1L, math.floor(bigN.toDouble / 2.0 - c).toLong)
    val kHi = math.min(bigN, bigN + 1 - kLo)
    val dif = ca.crossJoin(cb)
      .select((col("__va") - col("__vb")).as("v"),
        (col("__wa") * col("__wb")).as("__w"))
      .groupBy("v").agg(sum("__w").as("__na"))
      .select(lit("d").as("grp"), col("v"), col("__na"), lit(0L).as("__nb"))
    // maxGroupDistinct = 0 forces the distributed range-partitioned
    // cumulative pass — the pair table has ONE logical group, exactly
    // the shape the skew guard routes
    val cum = cumulativeByGroup(dif, withNext = false, 0L)
    def sel(k: Long, name: String) =
      min(when(col("__ca") >= k, col("v"))).as(name)
    cum.agg(sel(k1, "__d1"), sel(k2, "__d2"), sel(kLo, "__lo"),
        sel(kHi, "__hi"))
      .select(lit(nA).as("n_a"), lit(nB).as("n_b"),
        lit(bigN).as("n_pairs"),
        (round((col("__d1") + col("__d2")) / lit(2.0), 6) + lit(0d))
          .as("hl_shift"),
        (round(col("__lo"), 6) + lit(0d)).as("ci_lo"),
        (round(col("__hi"), 6) + lit(0d)).as("ci_hi"))
  }

  /** Sequential A/B test — the ALWAYS-VALID p-value that survives
    * peeking (round 17): [[proportionsZ]]'s p is only valid at ONE
    * pre-registered look, but every live dashboard invites reading the
    * experiment daily, and under the null a repeatedly-examined fixed-n
    * p crosses α=0.05 eventually with probability → 1. The mixture
    * sequential probability ratio test (mSPRT; Robbins 1970, the
    * Johari–Koomen–Pekelis–Walsh "Peeking at A/B Tests" always-valid
    * inference) closes this: against H₀: θ = 0 with a normal mixture
    * N(0, τ²) over the alternative,
    *   Λ_k = √(V_k/(V_k+τ²)) · exp(θ̂_k²·τ² / (2·V_k·(V_k+τ²)))
    * with θ̂_k = cumulative rate_a − rate_b and V_k the UNPOOLED
    * variance r_a(1−r_a)/n_a + r_b(1−r_b)/n_b at look k, and
    *   p_k = min(p_{k−1}, 1/Λ_k)
    * is an always-valid p: P(∃k: p_k ≤ α) ≤ α under H₀ at EVERY look
    * simultaneously — reject the moment it crosses, no schedule
    * pre-registration needed.
    *
    * `lookCol` is the pinned look ordinal (any monotone bucketing of
    * arrival order — hour, day, 10k-events chunk); counts accumulate
    * over looks in ordinal order. Looks where either arm is empty or
    * V = 0 report NULL Λ (not judged; the running min skips them).
    * τ² (`tauSq`, default 0.01) is the mixture variance — on the scale
    * of the SQUARED rate difference; smaller detects small lifts
    * faster, larger detects big lifts faster.
    *
    * Determinism: exact cumulative longs; Λ and 1/Λ pinned-order
    * double expressions (√/exp — the erfc convention's libm
    * dependence); running min over the look window. Output per look
    * (ordered): (look, n_a, k_a, n_b, k_b, rate_a, rate_b, lift,
    * p_seq, reject).
    *
    * Shape at scale: ONE map-side-combined per-look aggregate; the
    * cumulative window runs over the K look rows (look-cardinality,
    * never row-cardinality — the [[anovaF]] k-rows convention).
    */
  def sequentialMSPRT(df: DataFrame, lookCol: String, groupCol: String,
      successCol: String, armA: String, armB: String,
      tauSq: Double = 0.01, alpha: Double = 0.05): DataFrame = {
    require(armA != armB, "the two arms must differ")
    require(tauSq > 0, s"tauSq must be > 0, got $tauSq")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val slim = df.where(col(lookCol).isNotNull && col(groupCol).isNotNull
        && col(successCol).isNotNull
        && col(groupCol).cast("string").isin(armA, armB))
      .select(col(lookCol).cast("long").as("look"),
        (col(groupCol).cast("string") === armA).as("__isA"),
        col(successCol).cast("boolean").as("__s"))
    val per = slim.groupBy("look").agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("__na"),
      sum(when(col("__isA") && col("__s"), 1L).otherwise(0L)).as("__ka"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("__nb"),
      sum(when(!col("__isA") && col("__s"), 1L).otherwise(0L)).as("__kb"))
    // K look rows — the windows below run on look-cardinality data
    val w = Window.orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per.select(col("look"),
      sum("__na").over(w).as("n_a"), sum("__ka").over(w).as("k_a"),
      sum("__nb").over(w).as("n_b"), sum("__kb").over(w).as("k_b"))
    // ANSI-safe: every division sits under a lazy when() so a look
    // where an arm has no cumulative data yet reads NULL, not an error
    val ra = col("k_a").cast("double") / col("n_a").cast("double")
    val rb = col("k_b").cast("double") / col("n_b").cast("double")
    val theta = ra - rb
    val v = ra * (lit(1.0) - ra) / col("n_a").cast("double") +
      rb * (lit(1.0) - rb) / col("n_b").cast("double")
    val lam = when(col("n_a") > 0 && col("n_b") > 0,
      when(v > 0, sqrt(v / (v + lit(tauSq))) *
        exp((theta * theta * lit(tauSq))
          / (lit(2.0) * v * (v + lit(tauSq))))))
    val praw = when(lam.isNotNull, least(lit(1.0), lit(1.0) / lam))
    val staged = cum.withColumn("__praw", praw)
    val pseq = min(col("__praw")).over(w)
    staged
      .withColumn("rate_a",
        round(when(col("n_a") > 0, ra), 6) + lit(0d))
      .withColumn("rate_b",
        round(when(col("n_b") > 0, rb), 6) + lit(0d))
      .withColumn("lift",
        round(when(col("n_a") > 0 && col("n_b") > 0, theta), 6) + lit(0d))
      .withColumn("p_seq", round(pseq, 6) + lit(0d))
      .withColumn("reject",
        when(pseq.isNotNull, pseq <= lit(alpha)))
      .drop("__praw")
      .orderBy("look")
  }

  /** [[sequentialMSPRT]] for CONTINUOUS metrics (round 17): the same
    * always-valid mixture-SPRT machinery with θ̂_k = cumulative
    * mean_a − mean_b and V_k = v_a/n_a + v_b/n_b (the [[welchT]]
    * unpooled variance of the difference) at each look — revenue/
    * latency dashboards get the same peek-proof guarantee the
    * conversion readout has. τ² is on the scale of the SQUARED mean
    * difference (value units²) — size it to the lift worth detecting.
    * Looks where either arm has < 2 cumulative rows (or V = 0) report
    * NULL Λ (not judged; the running min skips them).
    *
    * Determinism: exact ×2^20 fixed-point DECIMAL(38,0) moments per
    * (look, arm) cumulated over looks; means/variances/Λ pinned-order
    * scalar doubles. Shape: ONE map-side-combined per-look aggregate,
    * look-cardinality windows. Output per look (ordered):
    * (look, n_a, n_b, mean_a, mean_b, lift, p_seq, reject).
    */
  def sequentialMSPRTMean(df: DataFrame, lookCol: String,
      groupCol: String, valueCol: String, armA: String, armB: String,
      tauSq: Double = 0.01, alpha: Double = 0.05): DataFrame = {
    require(armA != armB, "the two arms must differ")
    require(tauSq > 0, s"tauSq must be > 0, got $tauSq")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val fp = 1048576d
    val dec = "decimal(38,0)"
    val zero = lit(0L).cast(dec)
    val slim = df.where(col(lookCol).isNotNull && col(groupCol).isNotNull
        && col(valueCol).isNotNull
        && col(groupCol).cast("string").isin(armA, armB))
      .select(col(lookCol).cast("long").as("look"),
        (col(groupCol).cast("string") === armA).as("__isA"),
        round(col(valueCol).cast("double") * fp).cast("long").cast(dec)
          .as("__fp"))
    val per = slim.groupBy("look").agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("__na"),
      sum(when(col("__isA"), col("__fp")).otherwise(zero)).as("__sa"),
      sum(when(col("__isA"), col("__fp") * col("__fp")).otherwise(zero))
        .as("__qa"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("__nb"),
      sum(when(!col("__isA"), col("__fp")).otherwise(zero)).as("__sb"),
      sum(when(!col("__isA"), col("__fp") * col("__fp")).otherwise(zero))
        .as("__qb"))
    val w = Window.orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per.select(col("look"),
      sum("__na").over(w).as("n_a"), sum("__sa").over(w).as("__csa"),
      sum("__qa").over(w).as("__cqa"),
      sum("__nb").over(w).as("n_b"), sum("__sb").over(w).as("__csb"),
      sum("__qb").over(w).as("__cqb"))
    // the welchT moment arithmetic, per look row
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val sa = col("__csa").cast("double") / lit(fp)
    val sb = col("__csb").cast("double") / lit(fp)
    val qa = col("__cqa").cast("double") / lit(fp) / lit(fp)
    val qb = col("__cqb").cast("double") / lit(fp) / lit(fp)
    val ma = sa / na
    val mb = sb / nb
    val va = (qa - sa * sa / na) / (na - lit(1.0))
    val vb = (qb - sb * sb / nb) / (nb - lit(1.0))
    val theta = ma - mb
    val v = va / na + vb / nb
    val lam = when(col("n_a") >= 2 && col("n_b") >= 2,
      when(v > 0, sqrt(v / (v + lit(tauSq))) *
        exp((theta * theta * lit(tauSq))
          / (lit(2.0) * v * (v + lit(tauSq))))))
    val praw = when(lam.isNotNull, least(lit(1.0), lit(1.0) / lam))
    val staged = cum.withColumn("__praw", praw)
    val pseq = min(col("__praw")).over(w)
    staged
      .withColumn("mean_a",
        round(when(col("n_a") > 0, ma), 6) + lit(0d))
      .withColumn("mean_b",
        round(when(col("n_b") > 0, mb), 6) + lit(0d))
      .withColumn("lift",
        round(when(col("n_a") > 0 && col("n_b") > 0, theta), 6)
          + lit(0d))
      .withColumn("p_seq", round(pseq, 6) + lit(0d))
      .withColumn("reject",
        when(pseq.isNotNull, pseq <= lit(alpha)))
      .select("look", "n_a", "n_b", "mean_a", "mean_b", "lift",
        "p_seq", "reject")
      .orderBy("look")
  }

  /** Per-SEGMENT two-proportion z-tests — the "which segments moved"
    * readout behind every segmented A/B dashboard ([[proportionsZ]]
    * gives the one global answer; this gives one test per segment —
    * language, source, platform, time-of-day — computed ENTIRELY
    * in-plan so segment cardinality can be large). Feed the output to
    * [[bhAdjust]] before believing any per-segment flag: with s
    * segments, s·α of them "trip" by construction under the null — the
    * multiple-testing trap this pairing exists to close.
    *
    * Per segment: exact arm counts from ONE map-side-combined
    * aggregate, pooled-SE z as a pinned scalar expression, two-sided
    * p via the in-plan [[graft.functions.PValues.pTwoSidedZCol]] erfc
    * kernel. A segment missing an arm gets NULL rate/z/p (no
    * comparison — kept, loud); a degenerate pooled p̂ ∈ {0, 1} pins
    * z = 0, p = 1. Output per segment:
    * (segment, n_a, k_a, n_b, k_b, rate_a, rate_b, z, p_value).
    */
  def proportionsBySegment(df: DataFrame, segCol: String,
      groupCol: String, successCol: String,
      armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val slim = df.where(col(segCol).isNotNull && col(groupCol).isNotNull
        && col(successCol).isNotNull
        && col(groupCol).cast("string").isin(armA, armB))
      .select(col(segCol).cast("string").as("segment"),
        (col(groupCol).cast("string") === armA).as("__isA"),
        col(successCol).cast("boolean").as("__s"))
    val agg = slim.groupBy("segment").agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__isA") && col("__s"), 1L).otherwise(0L)).as("k_a"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__isA") && col("__s"), 1L).otherwise(0L)).as("k_b"))
    val ra = col("k_a").cast("double") / col("n_a").cast("double")
    val rb = col("k_b").cast("double") / col("n_b").cast("double")
    val pool = (col("k_a") + col("k_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se2 = pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a").cast("double")
        + lit(1.0) / col("n_b").cast("double"))
    val zRaw = when(col("n_a") > 0 && col("n_b") > 0,
      when(se2 > 0, (ra - rb) / sqrt(se2)).otherwise(lit(0.0)))
    agg.select(col("segment"),
      col("n_a"), col("k_a"), col("n_b"), col("k_b"),
      (round(when(col("n_a") > 0, ra), 6) + lit(0d)).as("rate_a"),
      (round(when(col("n_b") > 0, rb), 6) + lit(0d)).as("rate_b"),
      (round(zRaw, 6) + lit(0d)).as("z"),
      (round(when(zRaw.isNotNull,
        graft.functions.PValues.pTwoSidedZCol(zRaw)), 6) + lit(0d))
        .as("p_value"))
  }

  /** Per-group exact sufficient statistics for the variance-analysis
    * family: (grp, n, S, Q) with S = Σ round(x·2^20) and Q = Σ fp(x)²,
    * both DECIMAL(38,0) (order-insensitive, engine-exact; Q fits 38
    * digits up to ~10^12 rows of ~10^6-magnitude values). One map-side-
    * combined aggregate; only k group rows reach the caller.
    */
  private def groupMoments(df: DataFrame, groupCol: String,
      valueCol: String): Array[Row] = {
    val dec = "decimal(38,0)"
    val fpx = round(col(valueCol).cast("double") * 1048576d)
      .cast("long").cast(dec)
    df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        fpx.as("__fp"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n"), sum(col("__fp")).as("s"),
        sum(col("__fp") * col("__fp")).as("q"))
      .collect().sortBy(_.getString(0))(Utf8Order)
  }

  /** One-way ANOVA F — the PARAMETRIC sibling of [[kruskalWallis]]
    * (means instead of ranks; sharper when the arms are near-normal
    * with comparable variance, fragile to outliers where the rank test
    * is immune — run both, disagree = look at the tails):
    * F = (SSB/(k−1)) / (SSW/(N−k)) from the exact per-group sums, with
    * η² = SSB/SST riding along as the [0,1] effect size (the share of
    * total variance the grouping explains — F grows with N, η² does
    * not). `p_value` (round 17) is the F survival P(F_{k−1,N−k} > F)
    * from the pinned incomplete-beta kernel
    * ([[graft.functions.PValues.fSurvival]] — Lentz continued fraction,
    * fixed iteration count, tri-form like erfc/χ²).
    *
    * Determinism: per-group (n, Σfp, Σfp²) are exact DECIMAL(38,0)
    * sums of ×2^20 fixed-point longs; the k-term fold Σ S_g²/n_g runs
    * in GROUP-LABEL-ASC order on the driver ([[kruskalWallis]]'s
    * convention) and F/η² are pinned-order double expressions.
    *
    * Shape at scale: ONE map-side-combined group aggregate; k rows to
    * the driver. Output one row per group (grp, n, mean) plus the
    * repeated (f, dof1, dof2, eta_sq) readout, ordered by grp.
    */
  def anovaF(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val gm = groupMoments(df, groupCol, valueCol)
    require(gm.length >= 2, s"anovaF needs >= 2 groups, got ${gm.length}")
    val fp = 1048576d
    val bigN = gm.map(_.getLong(1)).sum
    require(bigN > gm.length, "anovaF needs N > k rows")
    val nn = bigN.toDouble
    var a = 0.0
    gm.foreach { r =>
      val sg = r.getDecimal(2).doubleValue() / fp
      a += sg * sg / r.getLong(1).toDouble
    }
    val st = gm.map(_.getDecimal(2)).reduce(_ add _).doubleValue() / fp
    val q = gm.map(_.getDecimal(3)).reduce(_ add _).doubleValue() / fp / fp
    val ssb = a - st * st / nn
    val ssw = q - a
    val sst = q - st * st / nn
    val k = gm.length
    val f = if (ssw > 0)
      (ssb / (k - 1).toDouble) / (ssw / (nn - k)) else 0.0
    val eta = if (sst > 0) ssb / sst else 0.0
    // round 17: F survival p from the pinned incomplete-beta kernel
    // (the unrounded f; d1 = k−1, d2 = N−k)
    val p = graft.functions.PValues.fSurvival(f, (k - 1).toDouble, nn - k)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val rows = gm.map { r =>
      Row(r.getString(0), r.getLong(1),
        r6(r.getDecimal(2).doubleValue() / fp / r.getLong(1).toDouble),
        r6(f), (k - 1).toLong, bigN - k, r6(eta), r6(p))
    }
    spark.createDataFrame(rows.toSeq.asJava,
      StructType(Seq(StructField("grp", StringType, false),
        StructField("n", LongType, false),
        StructField("mean", DoubleType, false),
        StructField("f", DoubleType, false),
        StructField("dof1", LongType, false),
        StructField("dof2", LongType, false),
        StructField("eta_sq", DoubleType, false),
        StructField("p_value", DoubleType, false))))
  }

  /** Welch's t — the two-sample mean comparison that does NOT assume
    * equal variances (Student's pooled t silently inflates false
    * positives when arm variances differ, the usual case for
    * treatment-vs-control value metrics): t = (m_a − m_b)/√(v_a/n_a +
    * v_b/n_b) with the Welch–Satterthwaite effective dof. Exact
    * fixed-point sufficient statistics ([[anovaF]]'s sums), pinned-
    * order doubles. `p_normal` (round 16) is the LARGE-SAMPLE normal
    * approximation erfc(|t|/√2) from the unrounded t; `p_t` (round 17)
    * is the EXACT Student-t two-sided p at the fractional
    * Welch–Satterthwaite dof via the pinned incomplete-beta kernel
    * ([[graft.functions.PValues.pStudentT2]]) — the two agree past 6dp
    * at corpus-scale n and diverge exactly in the tiny-per-arm regime
    * Welch exists for, where p_t is the one to read. Output ONE row:
    * (n_a, n_b, mean_a, mean_b, var_a, var_b, t, dof, p_normal, p_t).
    */
  def welchT(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val spark = a.sparkSession
    val fp = 1048576d
    def mom(df: DataFrame): (Long, Double, Double) = {
      val r = groupMoments(df.select(lit("x").as("__wg"),
        col(valueCol)), "__wg", valueCol)
      require(r.nonEmpty, "welchT: side has no non-null rows")
      (r.head.getLong(1), r.head.getDecimal(2).doubleValue() / fp,
        r.head.getDecimal(3).doubleValue() / fp / fp)
    }
    val (na, sa, qa) = mom(a)
    val (nb, sb, qb) = mom(b)
    require(na >= 2 && nb >= 2, s"welchT needs >= 2 rows per side")
    val ma = sa / na.toDouble
    val mb = sb / nb.toDouble
    val va = (qa - sa * sa / na.toDouble) / (na - 1).toDouble
    val vb = (qb - sb * sb / nb.toDouble) / (nb - 1).toDouble
    val se2 = va / na.toDouble + vb / nb.toDouble
    val t = if (se2 > 0) (ma - mb) / math.sqrt(se2) else 0.0
    val dof = if (se2 > 0)
      se2 * se2 / ((va / na.toDouble) * (va / na.toDouble) / (na - 1).toDouble
        + (vb / nb.toDouble) * (vb / nb.toDouble) / (nb - 1).toDouble)
    else 0.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val pv = graft.functions.PValues.round6(
      graft.functions.PValues.pTwoSidedZ(t))
    // round 17: exact Student-t p at the Welch–Satterthwaite
    // (fractional) dof via the pinned incomplete-beta kernel — the
    // small-n readout p_normal approximates
    val pt = graft.functions.PValues.round6(
      graft.functions.PValues.pStudentT2(t, dof))
    import spark.implicits._
    Seq((na, nb, r6(ma), r6(mb), r6(va), r6(vb), r6(t), r6(dof), pv, pt))
      .toDF("n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b", "t",
        "dof", "p_normal", "p_t")
  }

  /** Brown–Forsythe variance-homogeneity test (Levene's test with the
    * MEDIAN center — the robust variant): do the k arms have the same
    * SPREAD? Run before trusting [[anovaF]] (whose F assumes it) and as
    * a drift check in its own right — a variance change with a stable
    * mean is real drift ([[ksTest]] sees it, means do not). The
    * statistic is one-way ANOVA F over z = |x − median_g|: per-group
    * exact interpolated medians (Spark `percentile` == DuckDB
    * `quantile_cont`, the established equivalence), broadcast back, and
    * the [[anovaF]] machinery on the absolute deviations. Output one
    * row per group (grp, n, median, mean_absdev) plus the repeated
    * (f, dof1, dof2), ordered by grp.
    *
    * Shape at scale: one group-keyed percentile aggregate, one
    * broadcast join (group-cardinality), one map-side-combined moment
    * aggregate — the fact table never shuffles on anything but the
    * group key.
    */
  def brownForsythe(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val slim = graft.util.Caches.persist(
      df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
        .select(col(groupCol).cast("string").as("__g"),
          col(valueCol).cast("double").as("__v")))
    val med = slim.groupBy("__g")
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val z = slim.join(broadcast(med), "__g")
      .select(col("__g"), col("__med"),
        abs(col("__v") - col("__med")).as("__z"))
    val fp = 1048576d
    val gm = groupMoments(z, "__g", "__z")
    require(gm.length >= 2,
      s"brownForsythe needs >= 2 groups, got ${gm.length}")
    val bigN = gm.map(_.getLong(1)).sum
    require(bigN > gm.length, "brownForsythe needs N > k rows")
    val nn = bigN.toDouble
    var a = 0.0
    gm.foreach { r =>
      val sg = r.getDecimal(2).doubleValue() / fp
      a += sg * sg / r.getLong(1).toDouble
    }
    val st = gm.map(_.getDecimal(2)).reduce(_ add _).doubleValue() / fp
    val q = gm.map(_.getDecimal(3)).reduce(_ add _).doubleValue() / fp / fp
    val ssb = a - st * st / nn
    val ssw = q - a
    val k = gm.length
    val f = if (ssw > 0)
      (ssb / (k - 1).toDouble) / (ssw / (nn - k)) else 0.0
    // round 17: F survival p (the [[anovaF]] kernel on the deviations)
    val p = graft.functions.PValues.fSurvival(f, (k - 1).toDouble, nn - k)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val medians = med.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = gm.map { r =>
      Row(r.getString(0), r.getLong(1), r6(medians(r.getString(0))),
        r6(r.getDecimal(2).doubleValue() / fp / r.getLong(1).toDouble),
        r6(f), (k - 1).toLong, bigN - k, r6(p))
    }
    spark.createDataFrame(rows.toSeq.asJava,
      StructType(Seq(StructField("grp", StringType, false),
        StructField("n", LongType, false),
        StructField("median", DoubleType, false),
        StructField("mean_absdev", DoubleType, false),
        StructField("f", DoubleType, false),
        StructField("dof1", LongType, false),
        StructField("dof2", LongType, false),
        StructField("p_value", DoubleType, false))))
  }

  /** Mutual information between two categorical columns — the
    * INFORMATION-THEORETIC association readout next to
    * [[chiSquareIndependence]]'s χ² (χ² asks "is there association at
    * all"; MI measures HOW MUCH knowing one tells you about the other,
    * in nats — the feature-selection and leakage-detection number: a
    * near-1 normalized MI between a feature column and the label means
    * the feature IS the label). MI = Σ_occupied (o/N)·ln(o·N/(r·c));
    * empty cells contribute exactly 0 (lim p→0 of p·ln p), so unlike
    * χ² no grid expansion is needed. Normalized MI = MI/√(H_x·H_y) in
    * [0,1] (0 when either column is constant, by convention).
    *
    * Determinism (the [[chiSquareIndependence]] conventions): counts
    * exact longs; each cell/margin term one scalar double expression;
    * cross-cell and cross-margin sums accumulate ×2^20 fixed-point
    * longs. NULL categories are their own "(null)" level. Output ONE
    * row: (n, n_x, n_y, mi, h_x, h_y, nmi).
    *
    * Shape at scale: occupied-cell counts map-side combined, margins
    * re-aggregated from the cells, one-row totals broadcast —
    * cell-cardinality work end to end, the data never re-shuffles.
    */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val occupied = graft.util.Caches.persist(
      df.select(
          coalesce(col(xCol).cast("string"), lit("(null)")).as("__x"),
          coalesce(col(yCol).cast("string"), lit("(null)")).as("__y"))
        .groupBy("__x", "__y").agg(count(lit(1)).as("__o")))
    val rowsM = occupied.groupBy("__x").agg(sum("__o").as("__rx"))
    val colsM = occupied.groupBy("__y").agg(sum("__o").as("__cy"))
    val scale = (1L << 20).toDouble
    def entOf(m: DataFrame, cnt: String) = m
      .crossJoin(broadcast(occupied.agg(sum("__o").as("__n"))))
      .select(round((col(cnt).cast("double") / col("__n").cast("double"))
        * -log(col(cnt).cast("double") / col("__n").cast("double"))
        * scale).cast("long").as("__t"))
      .agg(sum("__t").as("__hfp"))
    val tot = occupied.agg(sum("__o").as("__n"),
      count_distinct(col("__x")).as("__nx"),
      count_distinct(col("__y")).as("__ny"))
    val miFp = occupied
      .join(rowsM, "__x").join(colsM, "__y")
      .crossJoin(broadcast(occupied.agg(sum("__o").as("__n"))))
      .select(round((col("__o").cast("double") / col("__n").cast("double"))
        * log(col("__o").cast("double") * col("__n").cast("double")
          / (col("__rx").cast("double") * col("__cy").cast("double")))
        * scale).cast("long").as("__t"))
      .agg(sum("__t").as("__mifp"))
    broadcast(tot)
      .crossJoin(broadcast(miFp))
      .crossJoin(broadcast(entOf(rowsM, "__rx")
        .withColumnRenamed("__hfp", "__hx")))
      .crossJoin(broadcast(entOf(colsM, "__cy")
        .withColumnRenamed("__hfp", "__hy")))
      .select(col("__n").as("n"), col("__nx").as("n_x"),
        col("__ny").as("n_y"),
        (round(col("__mifp").cast("double") / scale, 6) + lit(0d))
          .as("mi"),
        (round(col("__hx").cast("double") / scale, 6) + lit(0d))
          .as("h_x"),
        (round(col("__hy").cast("double") / scale, 6) + lit(0d))
          .as("h_y"),
        (round(when(col("__hx") > 0 && col("__hy") > 0,
          greatest(lit(0d), col("__mifp").cast("double") / scale)
            / sqrt((col("__hx").cast("double") / scale)
              * (col("__hy").cast("double") / scale)))
          .otherwise(lit(0d)), 6) + lit(0d)).as("nmi"))
  }

  /** Post-stratified arm means — the variance-reduction / imbalance
    * correction that needs no pre-period ([[cuped]] needs a covariate;
    * this needs only a stratum label): reweight each arm's
    * per-stratum means by the POOLED population's stratum shares,
    * mean_adj(a) = Σ_s (n_s/N)·m_{a,s}. When randomization left an arm
    * over-exposed to a heavy stratum, the raw means differ even under
    * no effect; the adjusted means do not.
    *
    * Determinism: per-(arm, stratum) sums are exact fixed-point
    * DECIMAL(38,0); each term (n_s/N)·m snaps to a ×2^20 long so the
    * cross-stratum sum is order-insensitive. Arms missing a stratum
    * fail loudly — their adjusted mean would silently compare
    * different populations.
    *
    * Output one row per arm: (arm, n, mean, mean_adj), ordered by arm.
    * Shape at scale: two map-side-combined aggregates (arm×stratum,
    * stratum) + one stratum-keyed join of stratum-cardinality tables.
    */
  def postStratified(df: DataFrame, armCol: String, stratumCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val fp = 1048576d
    val slim = graft.util.Caches.persist(
      df.where(col(armCol).isNotNull && col(stratumCol).isNotNull
          && col(valueCol).isNotNull)
        .select(col(armCol).cast("string").as("arm"),
          col(stratumCol).cast("string").as("__s"),
          round(col(valueCol).cast("double") * fp).cast("long")
            .as("__yfp")))
    val cell = slim.groupBy("arm", "__s")
      .agg(sum(col("__yfp").cast(dec)).as("__cs"),
        count(lit(1)).as("__cn"))
    val strata = cell.groupBy("__s").agg(sum("__cn").as("__sn"))
    val tot = strata.agg(sum("__sn").as("__tn"))
    val nArms = cell.select("arm").distinct().count()
    val nStrata = strata.count()
    val covered = cell.groupBy("arm").agg(count(lit(1)).as("__k"))
      .where(col("__k") =!= nStrata).limit(1).collect()
    if (covered.nonEmpty)
      throw new IllegalStateException(
        s"postStratified: arm '${covered.head.getString(0)}' is missing " +
          "strata — its adjusted mean would compare a different " +
          "population; filter to common strata explicitly first")
    require(nArms >= 2, s"postStratified needs >= 2 arms, got $nArms")
    cell.join(strata, "__s").crossJoin(broadcast(tot))
      .select(col("arm"), col("__cs"), col("__cn"),
        round((col("__sn").cast("double") / col("__tn").cast("double"))
          * (col("__cs").cast("double") / fp
            / col("__cn").cast("double")) * fp)
          .cast("long").as("__term"))
      .groupBy("arm")
      .agg(sum("__cn").as("n"), sum(col("__cs")).as("__as"),
        sum("__term").as("__adjfp"))
      .select(col("arm"), col("n"),
        (round(col("__as").cast("double") / fp / col("n").cast("double"),
          6) + lit(0d)).as("mean"),
        (round(col("__adjfp").cast("double") / fp, 6) + lit(0d))
          .as("mean_adj"))
  }

  /** Population Stability Index between two numeric snapshots — THE
    * industry score for "has this feature/metric distribution moved
    * enough to retrain/alarm" (credit-risk lineage; the usual bands:
    * <0.1 stable, 0.1–0.25 watch, >0.25 act):
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over `nBins` quantile bins
    * fitted on the REFERENCE snapshot `a` (equal-population by
    * construction there, so the score reacts to `b` moving — fixed-width
    * bins would let one outlier own half the range).
    *
    * Pinned conventions: bin bounds are `a`'s interpolated percentiles
    * i/nBins (Spark `percentile` == DuckDB `quantile_cont`), assignment
    * is first-bound-≥ (bin k catches everything above the last interior
    * bound; duplicate bounds leave interior bins empty); empty-bin
    * shares clamp to 1e-6 (the industry epsilon convention — PSI is
    * infinite on a truly vanished bin otherwise); per-bin terms are one
    * double expression over exact counts, summed as ×2^20 fixed-point
    * longs. Output one row per bin (bin, lo, hi, n_a, n_b, share_a,
    * share_b, term) plus the repeated `psi`, ordered by bin.
    *
    * Shape at scale: one percentile aggregate on `a`, the bounds ride
    * as plan literals (nBins+1 doubles), two map-side-combined bin
    * counts, a bin-cardinality join. The data shuffles only on the bin.
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val av = a.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val bv = b.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    // counts + the friendly require run BEFORE the bounds collect: an
    // empty reference snapshot must surface as this message, not as a
    // null unwrap on percentile's NULL result (round-15 ADVICE)
    val na = av.count()
    val nb = bv.count()
    require(na > 0 && nb > 0, s"both snapshots need rows: $na, $nb")
    val interior = psiInteriorBounds(av, nBins)
    psiCore(av, na, interior, psiBinCounts(bv, interior, nBins), nb, nBins)
  }

  /** `a`'s interior quantile bounds (raw doubles) for the [[psi]] bin
    * convention — the FROZEN state a streaming monitor carries: fit
    * once on the reference snapshot, then every micro-batch bins
    * against these literals ([[psiBinCounts]]) and the final score
    * ([[psiFromBinStore]]) replays [[psi]] exactly.
    */
  def psiInteriorBounds(reference: DataFrame, valueCol: String,
      nBins: Int): Seq[Double] = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val av = reference.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    require(av.limit(1).count() > 0, "reference snapshot needs rows")
    psiInteriorBounds(av, nBins)
  }

  private def psiInteriorBounds(av: DataFrame, nBins: Int): Seq[Double] = {
    val bounds = av.agg(expr(
      s"percentile(v, array(${(0 to nBins).map(i =>
        s"${i.toDouble / nBins}").mkString(",")}))").as("q"))
      .collect().head.getSeq[Double](0)
    // interior bounds only: bin i (1-based) = first i with v <= bound_i,
    // bin nBins catches the rest (including anything above a's max)
    bounds.slice(1, nBins)
  }

  private def psiBinOf(interior: Seq[Double], nBins: Int)(
      c: org.apache.spark.sql.Column) =
    interior.zipWithIndex.foldRight(lit(nBins)) { case ((bnd, i), acc) =>
      when(c <= bnd, i + 1).otherwise(acc)
    }

  /** Per-bin counts of `df`'s `v` column under the pinned [[psi]] bin
    * assignment — the compact per-micro-batch partial a streaming
    * monitor appends: (bin, n), at most nBins rows per batch. Exact
    * long counts sum across batches in any order, so the accumulated
    * store is split-invariant by construction.
    */
  def psiBinCounts(df: DataFrame, interior: Seq[Double],
      nBins: Int): DataFrame =
    df.select(psiBinOf(interior, nBins)(col("v")).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  /** Like [[psiBinCounts]] but projecting `valueCol` first (the
    * streaming-batch entry point; NULLs drop as in [[psi]]).
    */
  def psiBinCountsOf(df: DataFrame, valueCol: String,
      interior: Seq[Double], nBins: Int): DataFrame =
    psiBinCounts(df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull), interior, nBins)

  /** [[psi]] computed from an accumulated (bin, n) partial-count store
    * (the streaming monitor's read side): sums the partials — exact
    * longs, order-insensitive, so ANY micro-batch split yields the
    * batch result bit-for-bit — and replays the [[psi]] output against
    * the reference snapshot under the same frozen bounds.
    */
  def psiFromBinStore(reference: DataFrame, valueCol: String,
      interior: Seq[Double], store: DataFrame, nBins: Int): DataFrame = {
    require(interior.size == nBins - 1,
      s"need ${nBins - 1} interior bounds, got ${interior.size}")
    val av = reference.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val na = av.count()
    val cur = store.groupBy("bin").agg(sum("n").as("n"))
    val nb = cur.agg(coalesce(sum("n"), lit(0L)))
      .collect().head.getLong(0)
    require(na > 0 && nb > 0, s"both snapshots need rows: $na, $nb")
    psiCore(av, na, interior, cur, nb, nBins)
  }

  /** The shared [[psi]] tail: grid from the frozen bounds, reference
    * bin counts, the clamped shares / term / fixed-point total.
    */
  private def psiCore(av: DataFrame, na: Long, interior: Seq[Double],
      cur: DataFrame, nb: Long, nBins: Int): DataFrame = {
    // reported bounds round to 6dp (assignment uses the raw doubles) so
    // the engines' interpolated-percentile ULPs cannot reach the output
    def r6b(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val grid = av.sparkSession.createDataFrame(
      (1 to nBins).map(i => Row(i.toLong,
        if (i == 1) Double.NegativeInfinity else r6b(interior(i - 2)),
        if (i == nBins) Double.PositiveInfinity else r6b(interior(i - 1))))
        .asJava,
      StructType(Seq(StructField("bin", LongType, false),
        StructField("lo", DoubleType, false),
        StructField("hi", DoubleType, false))))
    val eps = 1e-6
    val scale = (1L << 20).toDouble
    val cells = grid
      .join(psiBinCounts(av, interior, nBins)
        .withColumnRenamed("n", "n_a"), Seq("bin"), "left")
      .join(cur.withColumnRenamed("n", "n_b"), Seq("bin"), "left")
      .select(col("bin"), col("lo"), col("hi"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("share_a",
        greatest(col("n_a").cast("double") / na, lit(eps)))
      .withColumn("share_b",
        greatest(col("n_b").cast("double") / nb, lit(eps)))
      .withColumn("term",
        (col("share_a") - col("share_b"))
          * log(col("share_a") / col("share_b")))
    val total = cells
      .select(round(col("term") * scale).cast("long").as("__t"))
      .agg(sum("__t").as("__psifp"))
    cells.crossJoin(broadcast(total))
      .select(col("bin"), col("lo"), col("hi"), col("n_a"), col("n_b"),
        (round(col("share_a"), 6) + lit(0d)).as("share_a"),
        (round(col("share_b"), 6) + lit(0d)).as("share_b"),
        (round(col("term"), 6) + lit(0d)).as("term"),
        (round(col("__psifp").cast("double") / scale, 6) + lit(0d))
          .as("psi"))
  }

  /** Jensen–Shannon divergence between two snapshots of a categorical
    * column — the bounded symmetric cousin of KL that
    * [[categoricalDrift]]'s total-variation cannot replace (TV weights
    * all mass moves equally; JSD weights them by surprisal, so mass
    * moving into a previously-EMPTY category scores maximally):
    * JSD = (KL(p‖m) + KL(q‖m))/2 with m = (p+q)/2, finite for any pair
    * (one-sided categories contribute p/2·ln 2 through m), bounded by
    * ln 2. Output ONE row: (n_a, n_b, n_categories, jsd, jsd_norm)
    * with jsd_norm = jsd/ln 2 ∈ [0, 1].
    *
    * Determinism: exact per-category counts (NULL its own level), each
    * category's KL terms one double expression, cross-category sums as
    * ×2^20 fixed-point longs. Shape at scale: [[categoricalDrift]]'s —
    * two map-side-combined counts, one category-cardinality full-outer
    * join, broadcast one-row totals.
    */
  def jensenShannon(a: DataFrame, b: DataFrame,
      catCol: String): DataFrame = {
    val ca = a.groupBy(coalesce(col(catCol).cast("string"), lit("(null)"))
      .as("category")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(coalesce(col(catCol).cast("string"), lit("(null)"))
      .as("category")).agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"),
      count(lit(1)).as("__k"))
    val scale = (1L << 20).toDouble
    val p = col("n_a").cast("double") / col("__ta").cast("double")
    val q = col("n_b").cast("double") / col("__tb").cast("double")
    val m = (p + q) / 2
    val term = when(col("n_a") > 0, p * log(p / m)).otherwise(lit(0d)) +
      when(col("n_b") > 0, q * log(q / m)).otherwise(lit(0d))
    joined.crossJoin(broadcast(totals))
      .select(col("__ta"), col("__tb"), col("__k"),
        round(term * scale).cast("long").as("__t"))
      .groupBy("__ta", "__tb", "__k")
      .agg(sum("__t").as("__fp"))
      .select(col("__ta").as("n_a"), col("__tb").as("n_b"),
        col("__k").as("n_categories"),
        (round(col("__fp").cast("double") / scale / 2.0, 6) + lit(0d))
          .as("jsd"),
        (round(col("__fp").cast("double") / scale / 2.0
          / math.log(2.0), 6) + lit(0d)).as("jsd_norm"))
  }

  /** 1-D Wasserstein distance (earth mover's) between two numeric
    * snapshots — the drift readout in the VALUE'S OWN UNITS that
    * [[ksStatistic]]'s sup-norm cannot give (KS saturates at the worst
    * point; W1 integrates HOW FAR the mass moved — a uniform +10 shift
    * of every value scores exactly 10): W1 = Σ_i |F_A(v_i) − F_B(v_i)|
    * · (v_{i+1} − v_i) over the merged sorted distinct values.
    *
    * Distributed exactly like [[ksStatistic]] — per-value counts, ONE
    * range-partitioned cumulative pass with collected per-partition
    * offsets, no global window. The "next value" each row needs is the
    * in-partition lead; each partition's LAST row takes the NEXT
    * partition's first value from the same collected per-partition
    * summary that carries the offsets (p rows to the driver, p =
    * shuffle partitions). |cumA·NB − cumB·NA| is exact DECIMAL(38,0);
    * each row's contribution (that ratio × gap) is one double, summed
    * as ×2^20 fixed-point longs. Output ONE row:
    * (n_a, n_b, n_values, w1).
    */
  def wasserstein1(a: DataFrame, b: DataFrame,
      valueCol: String): DataFrame = {
    val spark = a.sparkSession
    val ca = a.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull).groupBy("v")
      .agg(count(lit(1)).as("__na"))
    val cb = b.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull).groupBy("v")
      .agg(count(lit(1)).as("__nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val n = spark.sessionState.conf.numShufflePartitions
    val parts = graft.util.Caches.persist(
      merged.repartitionByRange(n, col("v"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("v")
    val local = parts
      .withColumn("__ca", sum("__na").over(w))
      .withColumn("__cb", sum("__nb").over(w))
      .withColumn("__nextv", lead("v", 1).over(w))
    // one driver round-trip carries offsets AND each partition's first
    // value (for boundary stitching) — p rows, p = shuffle partitions
    val summary = parts.groupBy("__pid")
      .agg(sum("__na").as("ta"), sum("__nb").as("tb"),
        min("v").as("firstv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    var runA = 0L
    var runB = 0L
    val offRows = summary.zipWithIndex.map { case ((pid, ta, tb, _), i) =>
      val next: java.lang.Double =
        if (i + 1 < summary.length) summary(i + 1)._4 else null
      val r = Row(pid, runA, runB, next)
      runA += ta; runB += tb; r
    }
    val na = runA
    val nb = runB
    require(na > 0 && nb > 0, s"both snapshots need rows: $na, $nb")
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__oa", LongType, false),
        StructField("__ob", LongType, false),
        StructField("__pnext", DoubleType, true))))
    val dec = "decimal(38,0)"
    val scale = (1L << 20).toDouble
    val raw = (col("__ca") + col("__oa")).cast(dec) * lit(nb).cast(dec) -
      (col("__cb") + col("__ob")).cast(dec) * lit(na).cast(dec)
    val gap = coalesce(col("__nextv"), col("__pnext")) - col("v")
    val contrib = when(raw < 0, -raw).otherwise(raw).cast("double") /
      (na.toDouble * nb.toDouble) * gap
    local.join(broadcast(offDf), "__pid")
      .where(coalesce(col("__nextv"), col("__pnext")).isNotNull)
      .select(round(contrib * scale).cast("long").as("__t"))
      .agg(sum("__t").as("__fp"), count(lit(1)).as("__m"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        (col("__m") + 1).as("n_values"),
        (round(col("__fp").cast("double") / scale, 6) + lit(0d))
          .as("w1"))
  }

  /** Per-GROUP 1-D Wasserstein distance — [[ksByGroup]]'s companion in
    * the VALUE'S OWN UNITS ([[wasserstein1]] per stratum: KS saturates
    * at the worst point; W1 says HOW FAR each group's mass moved — "the
    * zh slice shifted +40 tokens, the en slice didn't move"):
    * W1_g = Σ_i |F_a(v_i) − F_b(v_i)|·(v_{i+1} − v_i) over each group's
    * merged distinct values. Exact DECIMAL(38,0) numerators, per-row
    * contributions summed as ×2^20 fixed-point longs (the
    * [[wasserstein1]] conventions). Groups present on one side only
    * keep their row with NULL w1 (the [[ksByGroup]] convention).
    *
    * Shape at scale: per-(group, value) counts map-side combine the
    * data once; the cumulative-and-next pass is a PER-GROUP window for
    * the many-small-strata regime, with oversized strata routed
    * through the distributed range-partitioned form
    * ([[cumulativeByGroup]], round-17 skew guard; chunk-boundary
    * lead(v) stitched from collected first-values — bit-identical to
    * the window route). Output per group:
    * (grp, n_a, n_b, n_values, w1).
    */
  def wassersteinByGroup(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, maxGroupDistinct: Long = 4000000L): DataFrame = {
    def cnt(df: DataFrame, n: String) = df
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as(n))
    val merged = cnt(a, "__na")
      .join(cnt(b, "__nb"), Seq("grp", "v"), "full_outer")
      .select(col("grp"), col("v"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val dec = "decimal(38,0)"
    val cum = cumulativeByGroup(merged, withNext = true,
      maxGroupDistinct)
    val totals = merged.groupBy("grp")
      .agg(sum("__na").as("__ta"), sum("__nb").as("__tb"),
        count(lit(1)).as("__nv"))
    val raw = col("__ca").cast(dec) * col("__tb").cast(dec) -
      col("__cb").cast(dec) * col("__ta").cast(dec)
    val scale = (1L << 20).toDouble
    val contrib = when(raw < 0, -raw).otherwise(raw).cast("double") /
      (col("__ta").cast("double") * col("__tb").cast("double")) *
      (col("__nextv") - col("v"))
    cum.join(totals, "grp")
      .where(col("__nextv").isNotNull)
      .select(col("grp"), col("__ta"), col("__tb"), col("__nv"),
        // guarded: a one-sided group divides by ta·tb = 0 → ±Inf,
        // which DuckDB cannot cast to BIGINT (the oracle would ERROR,
        // not NULL) — both engines skip the term instead
        when(col("__ta") > 0 && col("__tb") > 0,
          round(contrib * scale).cast("long")).as("__t"))
      .groupBy("grp")
      .agg(max("__ta").as("n_a"), max("__tb").as("n_b"),
        max("__nv").as("n_values"), sum("__t").as("__fp"))
      .unionByName(
        // single-value or one-row groups never enter the gap pass; they
        // still report (w1 = 0 when both sides present — no mass can be
        // apart on a single value)
        cum.join(totals, "grp")
          .groupBy("grp")
          .agg(max("__ta").as("n_a"), max("__tb").as("n_b"),
            max("__nv").as("n_values"))
          .where(col("n_values") === 1)
          .withColumn("__fp", lit(0L)))
      .select(col("grp"), col("n_a"), col("n_b"), col("n_values"),
        (round(when(col("n_a") > 0 && col("n_b") > 0,
          col("__fp").cast("double") / scale), 6) + lit(0d)).as("w1"))
  }

  /** Cumulative Poisson(1) thresholds P(X ≤ k), k = 0..4 — double
    * literals shared verbatim with the oracle SQL so the inverse-CDF
    * draw is bit-identical cross-engine; the tail (u ≥ P(X ≤ 4),
    * ~0.37%) caps at weight 5.
    */
  private[graft] val PoissonCum: Seq[Double] = {
    val e1 = math.exp(-1.0)
    Seq(e1, e1 * 2, e1 * 2.5, e1 * (2.5 + 1.0 / 6),
      e1 * (2.5 + 1.0 / 6 + 1.0 / 24))
  }

  /** Poisson-bootstrap confidence interval for the mean (Chamandy et
    * al., Google 2012 "Estimating Uncertainty for Massive Data
    * Streams") — the uncertainty companion to [[meanPermutationTest]]'s
    * significance: each of `nBoot` resamples gives every row a weight
    * drawn Poisson(1), the scalable stand-in for multinomial resampling
    * (no global coordination, one pass, weights independent per row),
    * and the CI is the percentile interval over the resample means.
    *
    * DETERMINISTIC: the weight for (row, b) is the inverse Poisson CDF
    * applied to u = h32raw(id ':' b ':' salt)/2^32 — the exactly-uniform
    * pre-modulo hash domain ([[meanPermutationTest]]'s convention) with
    * cumulative thresholds pinned as shared double literals
    * ([[PoissonCum]]; weights cap at 5, the ~0.37% tail). Values fold as
    * ×2^20 fixed-point longs so every resample mean is exact up to one
    * double division; the percentile interpolation is the engine-shared
    * `percentile`/`quantile_cont` arithmetic over `nBoot` means. A
    * resample whose total weight is 0 contributes no mean (possible
    * only for tiny n; documented, not hidden).
    *
    * Shape at scale: one bounded explode (nBoot copies of each value
    * row) into ONE map-side-combined per-resample aggregate; the
    * percentile runs over nBoot one-row partials. Output is ONE row:
    * (n, mean, ci_lo, ci_hi, n_boot).
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      nBoot: Int = 200, level: Double = 0.95,
      salt: String = ""): DataFrame = {
    require(nBoot >= 2, s"nBoot must be >= 2, got $nBoot")
    require(level > 0 && level < 1, s"level must be in (0,1), got $level")
    import graft.functions.{TextFunctions => T}
    val scale = 1048576d
    val slim = df.where(col(valueCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        round(col(valueCol).cast("double") * scale).cast("long").as("__v"))
    val u = T.h32raw(concat(col("__id"), lit(":"),
      col("__b").cast("string"), lit(":"), lit(salt)))
      .cast("double") / 4294967296d
    // the inverse-CDF when-chain references its input FIVE times —
    // stage the draw in its own projection so the md5 evaluates once
    // per row (the wordShingles HOF-staging convention)
    val w = PoissonCum.zipWithIndex.foldRight(lit(5): org.apache.spark.sql.Column) {
      case ((thr, k), rest) => when(col("__u") < thr, lit(k)).otherwise(rest)
    }
    val means = slim
      .select(col("__id"), col("__v"),
        explode(sequence(lit(1), lit(nBoot))).as("__b"))
      .select(col("__b"), col("__v"), u.as("__u"))
      .select(col("__b"), col("__v"), w.cast("long").as("__w"))
      .groupBy("__b")
      .agg(sum(col("__w") * col("__v")).as("__s"), sum("__w").as("__n"))
      .where(col("__n") > 0)
      .select((col("__s").cast("double") / col("__n") / scale).as("__m"))
    // decimal-exact tail probabilities: (1-0.95)/2 in raw double is
    // 0.025000000000000022, and the percentile INDEX q·(n−1) must carry
    // the same literal on both engines
    val lo = ((BigDecimal(1) - BigDecimal(level.toString)) / 2).toDouble
    val hi = (BigDecimal(1) - BigDecimal(lo.toString)).toDouble
    val base = df.where(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(round(col(valueCol).cast("double") * scale).cast("long"))
          .as("__sv"))
    means.agg(
        (round(expr(s"percentile(__m, $lo)"), 6) + lit(0d)).as("ci_lo"),
        (round(expr(s"percentile(__m, $hi)"), 6) + lit(0d))
          .as("ci_hi"),
        count(lit(1)).as("n_boot"))
      .crossJoin(broadcast(base))
      .select(col("n"),
        (round(col("__sv").cast("double") / col("n") / scale, 6) + lit(0d))
          .as("mean"),
        col("ci_lo"), col("ci_hi"), col("n_boot"))
  }

  /** Poisson-bootstrap confidence interval for the LIFT (difference of
    * arm means) — the uncertainty readout on the number an A/B
    * decision actually turns on ([[bootstrapMeanCI]] bounds one arm;
    * [[proportionsZ]]'s Wilson intervals bound each RATE separately —
    * neither bounds mean_a − mean_b itself, and eyeballing overlap of
    * per-arm CIs is the classic false-negative): each of `nBoot`
    * resamples draws an independent Poisson(1) weight per unit on BOTH
    * sides (the [[bootstrapMeanCI]] deterministic inverse-CDF hash
    * draw, shared [[PoissonCum]] thresholds), and the CI is the
    * percentile interval over the resampled mean differences.
    *
    * Caller contract: `idCol` values are unique ACROSS the two sides
    * (they seed the per-unit draws; a shared id would correlate the
    * arms). Resamples where either side draws total weight 0 are
    * dropped (tiny-n possibility, documented not hidden); if EVERY
    * resample drops the query RAISES rather than emitting a NULL
    * interval. Values fold
    * as ×2^20 fixed-point longs; each resample's diff is the pinned
    * (sa/na)/2^20 − (sb/nb)/2^20 double; the interval is the
    * engine-shared percentile arithmetic over `nBoot` diffs.
    *
    * Shape at scale: one bounded explode (nBoot copies of each value
    * row, both sides in ONE union) into ONE map-side-combined
    * per-resample aggregate; the percentile runs over nBoot one-row
    * partials. Output ONE row:
    * (n_a, n_b, lift, ci_lo, ci_hi, n_boot).
    */
  def bootstrapLiftCI(a: DataFrame, b: DataFrame, idCol: String,
      valueCol: String, nBoot: Int = 200, level: Double = 0.95,
      salt: String = ""): DataFrame = {
    require(nBoot >= 2, s"nBoot must be >= 2, got $nBoot")
    require(level > 0 && level < 1, s"level must be in (0,1), got $level")
    import graft.functions.{TextFunctions => T}
    val scale = 1048576d
    def slim(df: DataFrame, g: Int) = df.where(col(valueCol).isNotNull)
      .select(lit(g).as("__g"), col(idCol).cast("string").as("__id"),
        round(col(valueCol).cast("double") * scale).cast("long")
          .as("__v"))
    val u = T.h32raw(concat(col("__id"), lit(":"),
      col("__b").cast("string"), lit(":"), lit(salt)))
      .cast("double") / 4294967296d
    val w = PoissonCum.zipWithIndex
      .foldRight(lit(5): org.apache.spark.sql.Column) {
        case ((thr, k), rest) =>
          when(col("__u") < thr, lit(k)).otherwise(rest)
      }
    val diffs = slim(a, 0).unionAll(slim(b, 1))
      .select(col("__g"), col("__id"), col("__v"),
        explode(sequence(lit(1), lit(nBoot))).as("__b"))
      .select(col("__g"), col("__b"), col("__v"), u.as("__u"))
      .select(col("__g"), col("__b"), col("__v"), w.cast("long").as("__w"))
      .groupBy("__b")
      .agg(
        sum(when(col("__g") === 0, col("__w") * col("__v"))).as("__sa"),
        sum(when(col("__g") === 0, col("__w")).otherwise(0L)).as("__na"),
        sum(when(col("__g") === 1, col("__w") * col("__v"))).as("__sb"),
        sum(when(col("__g") === 1, col("__w")).otherwise(0L)).as("__nb"))
      .where(col("__na") > 0 && col("__nb") > 0)
      .select((col("__sa").cast("double") / col("__na") / scale
        - col("__sb").cast("double") / col("__nb") / scale).as("__d"))
    val lo = ((BigDecimal(1) - BigDecimal(level.toString)) / 2).toDouble
    val hi = (BigDecimal(1) - BigDecimal(lo.toString)).toDouble
    def side(df: DataFrame, n: String, s: String) =
      df.where(col(valueCol).isNotNull)
        .agg(count(lit(1)).as(n),
          sum(round(col(valueCol).cast("double") * scale).cast("long"))
            .as(s))
    // LOUD when every resample dropped (one side drew total weight 0 in
    // all nBoot draws — tiny-n only): a silent NULL interval row would
    // diverge from the oracle's zero-row shape; both engines error.
    def loud(c: org.apache.spark.sql.Column) = when(col("n_boot") > 0, c)
      .otherwise(raise_error(lit("bootstrapLiftCI: every resample " +
        "dropped (a side drew total weight 0 in all draws) — increase " +
        "nBoot or the input size")))
    diffs.agg(
        (round(expr(s"percentile(__d, $lo)"), 6) + lit(0d)).as("ci_lo"),
        (round(expr(s"percentile(__d, $hi)"), 6) + lit(0d)).as("ci_hi"),
        count(lit(1)).as("n_boot"))
      .crossJoin(broadcast(side(a, "n_a", "__sva")))
      .crossJoin(broadcast(side(b, "n_b", "__svb")))
      .select(col("n_a"), col("n_b"),
        (round(col("__sva").cast("double") / col("n_a") / scale
          - col("__svb").cast("double") / col("n_b") / scale, 6)
          + lit(0d)).as("lift"),
        loud(col("ci_lo")).as("ci_lo"), loud(col("ci_hi")).as("ci_hi"),
        col("n_boot"))
  }

  /** Benjamini–Hochberg FDR correction (Benjamini & Hochberg 1995) over
    * a table of per-hypothesis p-values — the multiple-testing guard
    * every drift/AB DASHBOARD needs: run [[ksStatistic]] /
    * [[meanPermutationTest]] / [[srmCheck]] per feature or per metric
    * and 5% of null features "trip" at α=0.05 by construction; BH
    * controls the expected FALSE DISCOVERY fraction instead. Step-up
    * rule: sort p ascending, k* = max{k : p_(k) ≤ k·α/m}, reject
    * hypotheses ranked 1..k* (all of them — including any whose own
    * p > rank·α/m, the part naive per-row thresholding gets wrong).
    *
    * DISTRIBUTED rank, no global window (the [[ksStatistic]] CDF
    * machinery): range-partition by (p, idCols…), rank locally, add
    * per-partition offsets (one collected row per partition); k* is one
    * scalar max over qualifying rows broadcast back. Ties on p carry a
    * deterministic (idCols…) order — the REJECT SET is tie-order
    * invariant (all tied rows sit at ranks ≤ the highest tied rank, so
    * they accept/reject together), the rank column replayable.
    *
    * Output: (idCols…, p, rank, reject) for every input row; NULL
    * p-values are excluded (they are "not tested", not "significant").
    */
  def bhAdjust(df: DataFrame, idCols: Seq[String], pCol: String,
      alpha: Double = 0.05): DataFrame = {
    require(idCols.nonEmpty, "idCols must be non-empty (deterministic ties)")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val spark = df.sparkSession
    val slim = df
      .select(idCols.map(col) :+ col(pCol).cast("double").as("p"): _*)
      .where(col("p").isNotNull)
    val n = spark.sessionState.conf.numShufflePartitions
    val sortCols = col("p") +: idCols.map(col)
    val parts = graft.util.Caches.persist(
      slim.repartitionByRange(n, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val local = parts.withColumn("__lr", row_number().over(w).cast("long"))
    val totals = parts.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var run = 0L
    val offRows = totals.map { case (pid, c) =>
      val r = Row(pid, run); run += c; r
    }
    val m = run
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__off", LongType, false))))
    val ranked = graft.util.Caches.persist(
      local.join(broadcast(offDf), "__pid")
        .select(idCols.map(col) :+ col("p")
          :+ (col("__lr") + col("__off")).as("rank"): _*))
    // step-up: k* = max qualifying rank (0 when none) — ONE scalar row.
    // p·m <= rank·α evaluates identically on any engine (two double
    // products, no division).
    val kStar = ranked
      .agg(coalesce(max(when(col("p") * m <= col("rank") * alpha,
        col("rank"))), lit(0L)).as("__k"))
    ranked.crossJoin(broadcast(kStar))
      .select(idCols.map(col) :+ col("p") :+ col("rank")
        :+ (col("rank") <= col("__k")).as("reject"): _*)
  }

  /** One side's exact fixed-point value moments (n, Σx, Σx²) — the
    * [[welchT]] `mom` shape factored for the round-18 moment family
    * ([[welchTost]], [[powerMde]]): ONE map-side-combined aggregate,
    * one row to the driver, sums as ×2^20 DECIMAL(38,0).
    */
  private def sideMoments(df: DataFrame,
      valueCol: String): (Long, Double, Double) = {
    val fp = 1048576d
    val r = groupMoments(df.select(lit("x").as("__wg"),
      col(valueCol)), "__wg", valueCol)
    require(r.nonEmpty, s"side has no non-null '$valueCol' rows")
    (r.head.getLong(1), r.head.getDecimal(2).doubleValue() / fp,
      r.head.getDecimal(3).doubleValue() / fp / fp)
  }

  private def r6d(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Delta-method z-test for RATIO metrics — the readout [[welchT]]
    * cannot give: when a metric is a ratio of two per-unit sums
    * (revenue per session, clicks per view, tokens per document),
    * R = Σx/Σy = x̄/ȳ and BOTH components are random, so var(R) must
    * carry the x–y covariance. Classical large-sample delta method
    * (first-order Taylor of x̄/ȳ; the standard ratio-metric treatment
    * in online experimentation): per arm,
    * var(R) ≈ (s_xx − 2R·s_xy + R²·s_yy) / (n·ȳ²) with the SAMPLE
    * (co)variances of the per-unit pairs. Ignoring the covariance term
    * (i.e. welchT on per-unit ratios, or treating Σx/Σy as a mean)
    * mis-sizes the CI whenever numerator and denominator correlate —
    * which is always, for engagement metrics.
    *
    * `df` carries one row per RANDOMIZATION UNIT (user, session) with
    * the unit's numerator/denominator sums and its arm label in
    * `groupCol` — the caller aggregates events to units first, because
    * the unit of analysis must be the unit of randomization (event-level
    * rows would understate the variance). Rows with a NULL component
    * drop; each arm needs ≥ 2 units and a nonzero denominator sum.
    *
    * Output ONE row: (n_a, n_b, ratio_a, ratio_b, diff, se, z, p_value,
    * ci_lo, ci_hi) — diff = R_a − R_b, two-sided p = erfc(|z|/√2) via
    * the pinned kernel, CI at the `ciZ` critical point (default
    * 1.959964, the [[proportionsZ]] convention).
    *
    * Determinism: the six per-arm moments (n, Σx, Σy, Σx², Σy², Σxy)
    * are exact ×2^20 fixed-point DECIMAL(38,0) sums (products ×2^40 —
    * order-insensitive under any shuffle); everything after is pinned-
    * order driver doubles. Shape at scale: ONE map-side-combined
    * aggregate over the unit table, two rows to the driver.
    */
  def ratioDelta(df: DataFrame, groupCol: String, numCol: String,
      denCol: String, armA: String, armB: String,
      ciZ: Double = 1.959964): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val spark = df.sparkSession
    val dec = "decimal(38,0)"
    val fp = 1048576d
    def fpc(c: org.apache.spark.sql.Column) =
      round(c.cast("double") * fp).cast("long").cast(dec)
    val x = fpc(col(numCol)); val y = fpc(col(denCol))
    val rows = df
      .where(col(groupCol).isNotNull && col(numCol).isNotNull
        && col(denCol).isNotNull
        && col(groupCol).cast("string").isin(armA, armB))
      .select(col(groupCol).cast("string").as("__g"),
        x.as("__x"), y.as("__y"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"),
        sum(col("__x") * col("__y")).as("sxy"))
      .collect().map(r => r.getString(0) -> r).toMap
    def arm(name: String): (Long, Double, Double) = {
      val r = rows.getOrElse(name,
        throw new IllegalArgumentException(s"arm '$name' has no rows"))
      val n = r.getLong(1)
      require(n >= 2, s"ratioDelta needs >= 2 units per arm ('$name')")
      val sx = r.getDecimal(2).doubleValue() / fp
      val sy = r.getDecimal(3).doubleValue() / fp
      val sxx = r.getDecimal(4).doubleValue() / fp / fp
      val syy = r.getDecimal(5).doubleValue() / fp / fp
      val sxy = r.getDecimal(6).doubleValue() / fp / fp
      require(sy != 0.0,
        s"ratioDelta: arm '$name' has a zero denominator sum")
      val nd = n.toDouble
      val ratio = sx / sy
      val vxx = (sxx - sx * sx / nd) / (nd - 1.0)
      val vyy = (syy - sy * sy / nd) / (nd - 1.0)
      val vxy = (sxy - sx * sy / nd) / (nd - 1.0)
      val ybar = sy / nd
      val vr = (vxx - 2.0 * ratio * vxy + ratio * ratio * vyy) /
        (nd * ybar * ybar)
      (n, ratio, vr)
    }
    val (na, ra, va) = arm(armA)
    val (nb, rb, vb) = arm(armB)
    val diff = ra - rb
    val se2 = va + vb
    val se = if (se2 > 0) math.sqrt(se2) else 0.0
    val z = if (se > 0) diff / se else 0.0
    val pv = graft.functions.PValues.round6(
      graft.functions.PValues.pTwoSidedZ(z))
    spark.createDataFrame(
      Seq(Row(na, nb, r6d(ra), r6d(rb), r6d(diff), r6d(se), r6d(z), pv,
        r6d(diff - ciZ * se), r6d(diff + ciZ * se))).asJava,
      StructType(Seq(
        StructField("n_a", LongType, false),
        StructField("n_b", LongType, false),
        StructField("ratio_a", DoubleType, false),
        StructField("ratio_b", DoubleType, false),
        StructField("diff", DoubleType, false),
        StructField("se", DoubleType, false),
        StructField("z", DoubleType, false),
        StructField("p_value", DoubleType, false),
        StructField("ci_lo", DoubleType, false),
        StructField("ci_hi", DoubleType, false))))
  }

  /** Equivalence test (TOST — two one-sided tests, Schuirmann 1987)
    * on the Welch machinery: is the mean difference PROVABLY INSIDE
    * ±`margin`? A non-significant [[welchT]] never shows equivalence —
    * absence of evidence — while launch decisions constantly need
    * "the cheaper variant is NOT worse than δ" stated with error
    * control. TOST tests H₀₁: δ ≤ −margin and H₀₂: δ ≥ +margin; both
    * rejected at α ⇔ the (1−2α) CI lies inside (−margin, +margin).
    *
    * t_lower = (diff + margin)/se (reject H₀₁ when LARGE → upper-tail
    * p), t_upper = (diff − margin)/se (reject H₀₂ when SMALL →
    * lower-tail p), both at the Welch–Satterthwaite dof with the EXACT
    * one-sided Student-t p ([[graft.functions.PValues.pStudentTUpper]],
    * the pinned incomplete-beta kernel); p_tost = max(p_lower,
    * p_upper), `equivalent` = p_tost < `alpha`.
    *
    * Degenerate zero pooled SE pins t = 0, dof = 0, both p = 1,
    * equivalent = false — the [[welchT]] convention (no variance, no
    * decision). Determinism: exact fixed-point moments, pinned-order
    * doubles. Shape at scale: one map-side-combined aggregate per
    * side, one row each to the driver. Output ONE row: (n_a, n_b,
    * mean_a, mean_b, diff, se, dof, margin, t_lower, t_upper, p_lower,
    * p_upper, p_tost, equivalent).
    */
  def welchTost(a: DataFrame, b: DataFrame, valueCol: String,
      margin: Double, alpha: Double = 0.05): DataFrame = {
    require(margin > 0, s"margin must be > 0, got $margin")
    require(alpha > 0 && alpha < 0.5,
      s"alpha must be in (0, 0.5), got $alpha")
    val spark = a.sparkSession
    val (na, sa, qa) = sideMoments(a, valueCol)
    val (nb, sb, qb) = sideMoments(b, valueCol)
    require(na >= 2 && nb >= 2, "welchTost needs >= 2 rows per side")
    val ma = sa / na.toDouble
    val mb = sb / nb.toDouble
    val va = (qa - sa * sa / na.toDouble) / (na - 1).toDouble
    val vb = (qb - sb * sb / nb.toDouble) / (nb - 1).toDouble
    val se2 = va / na.toDouble + vb / nb.toDouble
    val se = if (se2 > 0) math.sqrt(se2) else 0.0
    val dof = if (se2 > 0)
      se2 * se2 / ((va / na.toDouble) * (va / na.toDouble) / (na - 1).toDouble
        + (vb / nb.toDouble) * (vb / nb.toDouble) / (nb - 1).toDouble)
    else 0.0
    val diff = ma - mb
    val tLo = if (se > 0) (diff + margin) / se else 0.0
    val tHi = if (se > 0) (diff - margin) / se else 0.0
    val P = graft.functions.PValues
    val pLo = P.round6(P.pStudentTUpper(tLo, dof))
    // lower tail at t_upper = upper tail at −t_upper (symmetry)
    val pHi = P.round6(P.pStudentTUpper(-tHi, dof))
    val pTost = math.max(pLo, pHi)
    spark.createDataFrame(
      Seq(Row(na, nb, r6d(ma), r6d(mb), r6d(diff), r6d(se), r6d(dof),
        margin, r6d(tLo), r6d(tHi), pLo, pHi, pTost,
        se > 0 && pTost < alpha)).asJava,
      StructType(Seq(
        StructField("n_a", LongType, false),
        StructField("n_b", LongType, false),
        StructField("mean_a", DoubleType, false),
        StructField("mean_b", DoubleType, false),
        StructField("diff", DoubleType, false),
        StructField("se", DoubleType, false),
        StructField("dof", DoubleType, false),
        StructField("margin", DoubleType, false),
        StructField("t_lower", DoubleType, false),
        StructField("t_upper", DoubleType, false),
        StructField("p_lower", DoubleType, false),
        StructField("p_upper", DoubleType, false),
        StructField("p_tost", DoubleType, false),
        StructField("equivalent", org.apache.spark.sql.types.BooleanType,
          false))))
  }

  /** Difference-in-differences estimator — the pre/post × treat/control
    * causal readout (classical panel econometrics; Card & Krueger 1994
    * is the canonical applied example): when treatment was NOT
    * randomized (a staged rollout, a market-level launch), the naive
    * post-period comparison confounds the treatment with pre-existing
    * group differences, and the naive before/after comparison confounds
    * it with time trends. DiD nets out both under the parallel-trends
    * assumption:
    *
    *   did = (m_T,post − m_T,pre) − (m_C,post − m_C,pre)
    *   se² = Σ_cell var_cell / n_cell   (four independent cells,
    *         large-sample normal — the standard 2×2 DiD variance)
    *
    * with z = did/se, two-sided erfc p, and the `ciZ` interval (default
    * 1.959964 — the [[proportionsZ]] convention). Sits beside [[cuped]]
    * (randomized + pre-period covariate → variance reduction) as the
    * NON-randomized counterpart.
    *
    * `df` carries unit rows with arm labels in `groupCol`, period
    * labels in `periodCol` (exactly `prePeriod`/`postPeriod` are read;
    * other labels and NULL rows drop) and the metric in `valueCol`.
    * Each of the four cells needs ≥ 2 rows (loud).
    *
    * Determinism: exact ×2^20 fixed-point moments per cell from ONE
    * map-side-combined aggregate (the [[welchT]] machinery on the
    * arm×period key); pinned-order driver doubles after. Output ONE
    * row: (n_t_pre, n_t_post, n_c_pre, n_c_post, mean_t_pre,
    * mean_t_post, mean_c_pre, mean_c_post, did, se, z, p_value, ci_lo,
    * ci_hi).
    */
  def did(df: DataFrame, groupCol: String, periodCol: String,
      valueCol: String, armT: String, armC: String, prePeriod: String,
      postPeriod: String, ciZ: Double = 1.959964): DataFrame = {
    require(armT != armC, "the two arms must differ")
    require(prePeriod != postPeriod, "the two periods must differ")
    val spark = df.sparkSession
    val fp = 1048576d
    val sep = "\u0001"
    val arm = col(groupCol).cast("string")
    val per = col(periodCol).cast("string")
    val cells = groupMoments(
      df.where(arm.isin(armT, armC) && per.isin(prePeriod, postPeriod))
        .select(concat_ws(sep, arm, per).as("__k"), col(valueCol)),
      "__k", valueCol)
      .map(r => r.getString(0) -> r).toMap
    def cell(a: String, p: String): (Long, Double, Double) = {
      val r = cells.getOrElse(s"$a$sep$p",
        throw new IllegalArgumentException(
          s"did: cell ($a, $p) has no rows"))
      val n = r.getLong(1)
      require(n >= 2, s"did: cell ($a, $p) needs >= 2 rows, got $n")
      val s = r.getDecimal(2).doubleValue() / fp
      val q = r.getDecimal(3).doubleValue() / fp / fp
      val m = s / n.toDouble
      val v = (q - s * s / n.toDouble) / (n - 1).toDouble
      (n, m, v / n.toDouble)
    }
    val (ntp, mtp, vtp) = cell(armT, prePeriod)
    val (nto, mto, vto) = cell(armT, postPeriod)
    val (ncp, mcp, vcp) = cell(armC, prePeriod)
    val (nco, mco, vco) = cell(armC, postPeriod)
    val didv = (mto - mtp) - (mco - mcp)
    val se2 = vtp + vto + vcp + vco
    val se = if (se2 > 0) math.sqrt(se2) else 0.0
    val z = if (se > 0) didv / se else 0.0
    val P = graft.functions.PValues
    val pv = P.round6(P.pTwoSidedZ(z))
    spark.createDataFrame(
      Seq(Row(ntp, nto, ncp, nco, r6d(mtp), r6d(mto), r6d(mcp),
        r6d(mco), r6d(didv), r6d(se), r6d(z), pv,
        r6d(didv - ciZ * se), r6d(didv + ciZ * se))).asJava,
      StructType(Seq(
        StructField("n_t_pre", LongType, false),
        StructField("n_t_post", LongType, false),
        StructField("n_c_pre", LongType, false),
        StructField("n_c_post", LongType, false),
        StructField("mean_t_pre", DoubleType, false),
        StructField("mean_t_post", DoubleType, false),
        StructField("mean_c_pre", DoubleType, false),
        StructField("mean_c_post", DoubleType, false),
        StructField("did", DoubleType, false),
        StructField("se", DoubleType, false),
        StructField("z", DoubleType, false),
        StructField("p_value", DoubleType, false),
        StructField("ci_lo", DoubleType, false),
        StructField("ci_hi", DoubleType, false))))
  }

  /** Pinned standard-normal quantiles for the sensitivity readout —
    * plan-time LOOKUP, not an inverse-erf evaluation: [[powerMde]]
    * accepts exactly these α / power levels so the Spark side and any
    * replay read the SAME public constants (Φ⁻¹ to 6dp). Keys are
    * upper-tail masses for α entries (z_{1−α/2}) and target powers
    * (z_power).
    */
  private val ZCrit: Map[Double, Double] = Map(
    0.01 -> 2.575829, // z_{0.995}
    0.05 -> 1.959964, // z_{0.975}
    0.10 -> 1.644854) // z_{0.95}
  private val ZPower: Map[Double, Double] = Map(
    0.80 -> 0.841621, // z_{0.80}
    0.90 -> 1.281552, // z_{0.90}
    0.95 -> 1.644854) // z_{0.95}

  /** Experiment sensitivity readout — MDE and achieved power: "what
    * lift COULD this test have seen?", the question that separates
    * "no effect" from "underpowered" (the most common misread of a
    * flat A/B). Large-sample normal approximation throughout (the
    * standard power-calculation convention; at experimentation n the
    * t correction is past 6dp):
    *
    *   mde_abs  = (z_{1−α/2} + z_power) · se        (the smallest true
    *              |δ| this design detects at the target power)
    *   mde_rel  = mde_abs / |mean_b|                (vs control; NULL
    *              when mean_b = 0)
    *   power_observed = Φ(|diff|/se − z_{1−α/2})    (the power this
    *              design had against the OBSERVED difference)
    *   n_per_arm_required = ceil((z_{1−α/2}+z_power)²·(v_a+v_b)/diff²)
    *              (equal-n redesign that reaches the target power at
    *              the observed difference and variances; NULL when
    *              diff = 0)
    *
    * `alpha` ∈ {0.01, 0.05, 0.10} and `power` ∈ {0.80, 0.90, 0.95}
    * select PINNED public Φ⁻¹ constants ([[ZCrit]]/[[ZPower]]) — a
    * lookup, not an inverse-erf kernel — so every number replays
    * bit-identically. Zero pooled variance is a loud error (a
    * sensitivity readout over constants is meaningless). Φ evaluates
    * through the pinned erfc kernel: Φ(x) = erfc(−x/√2)/2.
    *
    * Shape at scale: one map-side-combined moment aggregate per side
    * (the [[welchT]] shape), one row each to the driver. Output ONE
    * row: (n_a, n_b, mean_a, mean_b, diff, se, mde_abs, mde_rel,
    * power_observed, n_per_arm_required).
    */
  def powerMde(a: DataFrame, b: DataFrame, valueCol: String,
      alpha: Double = 0.05, power: Double = 0.8): DataFrame = {
    val zA = ZCrit.getOrElse(alpha, throw new IllegalArgumentException(
      s"alpha must be one of ${ZCrit.keys.toSeq.sorted.mkString(", ")}" +
        s" (pinned quantiles), got $alpha"))
    val zP = ZPower.getOrElse(power, throw new IllegalArgumentException(
      s"power must be one of ${ZPower.keys.toSeq.sorted.mkString(", ")}" +
        s" (pinned quantiles), got $power"))
    val spark = a.sparkSession
    val (na, sa, qa) = sideMoments(a, valueCol)
    val (nb, sb, qb) = sideMoments(b, valueCol)
    require(na >= 2 && nb >= 2, "powerMde needs >= 2 rows per side")
    val ma = sa / na.toDouble
    val mb = sb / nb.toDouble
    val va = (qa - sa * sa / na.toDouble) / (na - 1).toDouble
    val vb = (qb - sb * sb / nb.toDouble) / (nb - 1).toDouble
    val se2 = va / na.toDouble + vb / nb.toDouble
    require(se2 > 0, "powerMde: zero pooled variance — the sensitivity " +
      "readout is undefined over constant metrics")
    val se = math.sqrt(se2)
    val diff = ma - mb
    val mdeAbs = (zA + zP) * se
    val mdeRel: java.lang.Double =
      if (mb != 0.0) r6d(mdeAbs / math.abs(mb)) else null
    // Φ through the pinned erfc kernel, which is defined for x ≥ 0
    // only — branch on the argument sign: Φ(y ≥ 0) = 1 − erfc(y/√2)/2,
    // Φ(y < 0) = erfc(−y/√2)/2 (mirrored as a CASE in the oracle)
    val x = math.abs(diff) / se - zA
    val powerObs =
      if (x >= 0) 1.0 - graft.functions.PValues
        .erfc(x / math.sqrt(2.0)) / 2.0
      else graft.functions.PValues.erfc(-x / math.sqrt(2.0)) / 2.0
    val nReq: java.lang.Long =
      if (diff != 0.0)
        java.lang.Long.valueOf(math.ceil(
          (zA + zP) * (zA + zP) * (va + vb) / (diff * diff)).toLong)
      else null
    spark.createDataFrame(
      Seq(Row(na, nb, r6d(ma), r6d(mb), r6d(diff), r6d(se), r6d(mdeAbs),
        mdeRel, r6d(powerObs), nReq)).asJava,
      StructType(Seq(
        StructField("n_a", LongType, false),
        StructField("n_b", LongType, false),
        StructField("mean_a", DoubleType, false),
        StructField("mean_b", DoubleType, false),
        StructField("diff", DoubleType, false),
        StructField("se", DoubleType, false),
        StructField("mde_abs", DoubleType, false),
        StructField("mde_rel", DoubleType, true),
        StructField("power_observed", DoubleType, false),
        StructField("n_per_arm_required", LongType, true))))
  }

  /** Cochran–Mantel–Haenszel test + Mantel–Haenszel pooled odds ratio
    * (Cochran 1954; Mantel & Haenszel 1959) — the STRATIFIED two-arm
    * conversion test: [[proportionsZ]] on pooled counts is exposed to
    * Simpson's paradox whenever the arm mix differs across strata
    * (country, platform, day); CMH tests the common treatment effect
    * WITHIN strata and pools only the within-stratum evidence. Per
    * stratum k with the 2×2 cell counts (n11 = arm-A successes, row
    * totals n1+/n2+, column totals n+1/n+2, total n):
    *
    *   χ²_CMH = (Σ_k (n11k − n1+k·n+1k/nk))²
    *            / Σ_k n1+k·n2+k·n+1k·n+2k / (nk²·(nk − 1)),  dof 1
    *   OR_MH  = Σ_k (n11k·n22k/nk) / Σ_k (n12k·n21k/nk)
    *
    * (no continuity correction — pinned; both engines evaluate the
    * same expression). Complements [[proportionsBySegment]]: that
    * reads each stratum separately (which segment moved); CMH answers
    * whether there is ONE effect after controlling for the strata.
    *
    * Strata with fewer than 2 units contribute 0 to every sum (the
    * variance term is undefined at n = 1 and a 1-unit stratum carries
    * no within-stratum contrast); strata missing an arm contribute 0
    * by arithmetic (n2+ = 0 zeroes the variance and centers the diff).
    * OR_MH is NULL when its denominator is 0 (no discordant cells
    * anywhere).
    *
    * Determinism: exact long cell counts per stratum from ONE
    * map-side-combined aggregate; each per-stratum term snaps to
    * ×2^20 fixed point before the cross-stratum sum (order-insensitive
    * — the engine-wide convention); χ²/p/OR are scalar expressions on
    * the one-row totals, p through the in-plan closed-form χ²(1)
    * survival. Entirely in-plan — stratum cardinality can be large.
    * Output ONE row: (n_strata, n, chi2, p_value, or_mh).
    */
  def cmh(df: DataFrame, segCol: String, groupCol: String,
      successCol: String, armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val fp = 1048576d
    val arm = col(groupCol).cast("string")
    val succ = col(successCol).cast("boolean")
    val cells = df
      .where(col(segCol).isNotNull && col(groupCol).isNotNull
        && col(successCol).isNotNull && arm.isin(armA, armB))
      .groupBy(col(segCol).cast("string").as("seg"))
      .agg(count(lit(1)).as("n"),
        sum(when(arm === armA && succ, 1L).otherwise(0L)).as("n11"),
        sum(when(arm === armA && !succ, 1L).otherwise(0L)).as("n12"),
        sum(when(arm === armB && succ, 1L).otherwise(0L)).as("n21"),
        sum(when(arm === armB && !succ, 1L).otherwise(0L)).as("n22"))
    def d(c: String) = col(c).cast("double")
    val n1p = d("n11") + d("n12"); val n2p = d("n21") + d("n22")
    val np1 = d("n11") + d("n21"); val np2 = d("n12") + d("n22")
    val nn = d("n")
    def snap(c: org.apache.spark.sql.Column) =
      when(col("n") >= 2, round(c * fp).cast("long")).otherwise(0L)
    val terms = cells.select(col("n"),
      snap(d("n11") - n1p * np1 / nn).as("__d6"),
      snap(n1p * n2p * np1 * np2 / (nn * nn * (nn - lit(1.0))))
        .as("__v6"),
      snap(d("n11") * d("n22") / nn).as("__on6"),
      snap(d("n12") * d("n21") / nn).as("__od6"))
    val tot = terms.agg(count(lit(1)).as("n_strata"),
      sum("n").as("n"), sum("__d6").as("sd6"), sum("__v6").as("sv6"),
      sum("__on6").as("son6"), sum("__od6").as("sod6"))
    val sd = col("sd6").cast("double") / fp
    val sv = col("sv6").cast("double") / fp
    val chi2 = sd * sd / sv
    val P = graft.functions.PValues
    tot.select(col("n_strata"), col("n"),
      when(col("sv6") > 0, round(chi2, 6) + lit(0d)).as("chi2"),
      when(col("sv6") > 0,
        round(P.chiSqSurvivalCol(chi2, 1), 6) + lit(0d))
        .otherwise(lit(1d)).as("p_value"),
      when(col("sod6") > 0,
        round(col("son6").cast("double") / col("sod6").cast("double"), 6)
          + lit(0d)).as("or_mh"))
  }

  /** Yuen's trimmed-mean t (Yuen 1974) — the ROBUST two-sample mean
    * comparison: [[welchT]] on heavy-tailed metrics (latency, revenue)
    * is driven by the tail — a handful of outliers moves both the mean
    * and the variance, and power collapses. Yuen compares `trim`-level
    * trimmed means with winsorized variances at a Welch-style dof:
    * per side, g = ⌊trim·n⌋ rows come off EACH tail (h = n − 2g
    * remain), the trimmed mean is the mean of the middle h, the
    * winsorized variance s_w² replaces each trimmed row by the nearest
    * kept order statistic, d = s_w²·(n−1)/(h·(h−1)), and
    *
    *   t = (t̄_a − t̄_b) / √(d_a + d_b),
    *   dof = 1 / (c²/(h_a−1) + (1−c)²/(h_b−1)),  c = d_a/(d_a+d_b),
    *
    * with the EXACT Student-t p via the pinned incomplete-beta kernel.
    * Sits beside [[mannWhitney]]/[[hodgesLehmann]]: the rank pair asks
    * about stochastic order; Yuen still estimates a MEAN-style effect
    * in the metric's units, just one the tail cannot own.
    *
    * Convention: values snap to ×2^20 fixed point FIRST (the
    * engine-wide determinism convention) and trimming operates on the
    * snapped values — order statistics, partial sums, and winsorized
    * moments are then EXACT integers under any partitioning, and ties
    * at the trim boundary resolve by value (the g lowest/highest ROWS
    * leave; boundary-tied rows that stay winsorize to their own value,
    * a no-op — the classical definition).
    *
    * Shape at scale: per-value counts map-side combine both sides into
    * ONE merged distinct-value table; the cumulative pass is the
    * [[ksStatistic]] distributed range-partitioned form (per-partition
    * windows + one collected offset row per partition — no global
    * window); the trim boundaries are the ≤ 4 rows where the
    * cumulative count CROSSES g / n−g (an exact filter, one collect);
    * the winsorized moments are one more conditional aggregate over
    * the count table with the boundaries as plan literals. Everything
    * driver-side is O(1). Output ONE row: (n_a, n_b, g_a, g_b, h_a,
    * h_b, tmean_a, tmean_b, diff, se, t, dof, p_t).
    */
  def yuenTrimmed(a: DataFrame, b: DataFrame, valueCol: String,
      trim: Double = 0.2): DataFrame = {
    require(trim > 0 && trim < 0.5, s"trim must be in (0, 0.5), got $trim")
    val spark = a.sparkSession
    val fp = 1048576d
    val dec = "decimal(38,0)"
    // snapped-value count tables (the fp long rides as an EXACT double:
    // |v·2^20| < 2^53 for any 6dp metric — and stays orderable by the
    // range partitioner)
    def cnt(df: DataFrame, n: String) = df
      .where(col(valueCol).isNotNull)
      .select(round(col(valueCol).cast("double") * fp)
        .cast("long").cast("double").as("v"))
      .groupBy("v").agg(count(lit(1)).as(n))
    val merged = cnt(a, "__na").join(cnt(b, "__nb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parts = graft.util.Caches.persist(
      merged.repartitionByRange(nPart, col("v"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("v")
    val local = parts
      .withColumn("__la", sum("__na").over(w))
      .withColumn("__lb", sum("__nb").over(w))
    val chunkTotals = parts.groupBy("__pid")
      .agg(sum("__na").as("ta"), sum("__nb").as("tb"))
      .collect().sortBy(_.getInt(0))
    val nA = chunkTotals.map(_.getLong(1)).sum
    val nB = chunkTotals.map(_.getLong(2)).sum
    val gA = math.floor(nA.toDouble * trim).toLong
    val gB = math.floor(nB.toDouble * trim).toLong
    require(gA >= 1 && gB >= 1,
      s"yuenTrimmed: trim=$trim trims 0 rows on a side " +
        s"(n_a=$nA, n_b=$nB) — use welchT instead")
    val hA = nA - 2 * gA; val hB = nB - 2 * gB
    require(hA >= 2 && hB >= 2,
      s"yuenTrimmed needs >= 2 kept rows per side (h_a=$hA, h_b=$hB)")
    // global cumulative = local window + per-partition offsets
    var (ra, rb) = (0L, 0L)
    val offRows = chunkTotals.map { r =>
      val row = Row(r.getInt(0), ra, rb)
      ra += r.getLong(1); rb += r.getLong(2); row
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__oa", LongType, false),
        StructField("__ob", LongType, false))))
    val cum = local.join(broadcast(offDf), "__pid")
      .select(col("v"), col("__na"), col("__nb"),
        (col("__la") + col("__oa")).as("__ca"),
        (col("__lb") + col("__ob")).as("__cb"))
    // the 4 boundary rows: where the side's cumulative count CROSSES
    // g+1 (lower cut) or n−g (upper cut) — each predicate selects
    // exactly one row; one collect of <= 4 rows
    val hits = cum.where(
      (col("__ca") - col("__na") < gA + 1 && col("__ca") >= gA + 1) ||
      (col("__ca") - col("__na") < nA - gA && col("__ca") >= nA - gA) ||
      (col("__cb") - col("__nb") < gB + 1 && col("__cb") >= gB + 1) ||
      (col("__cb") - col("__nb") < nB - gB && col("__cb") >= nB - gB))
      .collect()
    def boundary(thr: Long, cumIdx: Int, cntIdx: Int): (Long, Long) = {
      val r = hits.find(r => r.getLong(cumIdx) >= thr &&
        r.getLong(cumIdx) - r.getLong(cntIdx) < thr)
        .getOrElse(throw new IllegalStateException(
          s"yuenTrimmed: no cumulative crossing at $thr"))
      (r.getDouble(0).toLong, r.getLong(cumIdx) - r.getLong(cntIdx))
    }
    // (boundary fp value, rows strictly below it)
    val (loAv, belowLoA) = boundary(gA + 1, 3, 1)
    val (hiAv, belowHiA) = boundary(nA - gA, 3, 1)
    val (loBv, belowLoB) = boundary(gB + 1, 4, 2)
    val (hiBv, belowHiB) = boundary(nB - gB, 4, 2)
    val cHiA = nA - (belowHiA +
      hits.find(r => r.getDouble(0).toLong == hiAv).map(_.getLong(1))
        .getOrElse(0L))
    val cHiB = nB - (belowHiB +
      hits.find(r => r.getDouble(0).toLong == hiBv).map(_.getLong(2))
        .getOrElse(0L))
    // mid-range exact sums with the boundaries as plan literals (off
    // the still-persisted count table — no source re-scan)
    val mid = parts.agg(
      sum(when(col("v") >= loAv.toDouble && col("v") <= hiAv.toDouble,
        col("v").cast(dec) * col("__na")).otherwise(lit(0).cast(dec)))
        .as("sma"),
      sum(when(col("v") >= loAv.toDouble && col("v") <= hiAv.toDouble,
        col("v").cast(dec) * col("v").cast(dec) * col("__na"))
        .otherwise(lit(0).cast(dec))).as("qma"),
      sum(when(col("v") >= loBv.toDouble && col("v") <= hiBv.toDouble,
        col("v").cast(dec) * col("__nb")).otherwise(lit(0).cast(dec)))
        .as("smb"),
      sum(when(col("v") >= loBv.toDouble && col("v") <= hiBv.toDouble,
        col("v").cast(dec) * col("v").cast(dec) * col("__nb"))
        .otherwise(lit(0).cast(dec))).as("qmb"))
      .collect().head
    parts.unpersist(blocking = false)
    def dv(i: Int): BigInt = BigInt(mid.getDecimal(i).toBigInteger)
    val (smA, qmA, smB, qmB) = (dv(0), dv(1), dv(2), dv(3))
    // per-side Yuen quantities — trimmed sum and winsorized moments in
    // EXACT BigInt fixed point, then pinned-order doubles
    def side(n: Long, g: Long, h: Long, lo: Long, hi: Long,
        cLo: Long, cHi: Long, sm: BigInt, qm: BigInt): (Double, Double) = {
      val trimmedFp = sm - BigInt(g - cLo) * BigInt(lo) -
        BigInt(g - cHi) * BigInt(hi)
      val wFp = sm + BigInt(cLo) * BigInt(lo) + BigInt(cHi) * BigInt(hi)
      val w2Fp = qm + BigInt(cLo) * BigInt(lo) * BigInt(lo) +
        BigInt(cHi) * BigInt(hi) * BigInt(hi)
      val tmean = trimmedFp.toDouble / fp / h.toDouble
      val wd = wFp.toDouble / fp
      val w2d = w2Fp.toDouble / fp / fp
      val sw2 = (w2d - wd * wd / n.toDouble) / (n - 1).toDouble
      val d = sw2 * (n - 1).toDouble / (h.toDouble * (h - 1).toDouble)
      (tmean, d)
    }
    val (tmA, dA) = side(nA, gA, hA, loAv, hiAv, belowLoA, cHiA, smA, qmA)
    val (tmB, dB) = side(nB, gB, hB, loBv, hiBv, belowLoB, cHiB, smB, qmB)
    val se2 = dA + dB
    val se = if (se2 > 0) math.sqrt(se2) else 0.0
    val t = if (se > 0) (tmA - tmB) / se else 0.0
    val dof = if (se2 > 0) {
      val c = dA / se2
      1.0 / (c * c / (hA - 1).toDouble +
        (1.0 - c) * (1.0 - c) / (hB - 1).toDouble)
    } else 0.0
    val P = graft.functions.PValues
    val pt = P.round6(P.pStudentT2(t, dof))
    spark.createDataFrame(
      Seq(Row(nA, nB, gA, gB, hA, hB, r6d(tmA), r6d(tmB),
        r6d(tmA - tmB), r6d(se), r6d(t), r6d(dof), pt)).asJava,
      StructType(Seq(
        StructField("n_a", LongType, false),
        StructField("n_b", LongType, false),
        StructField("g_a", LongType, false),
        StructField("g_b", LongType, false),
        StructField("h_a", LongType, false),
        StructField("h_b", LongType, false),
        StructField("tmean_a", DoubleType, false),
        StructField("tmean_b", DoubleType, false),
        StructField("diff", DoubleType, false),
        StructField("se", DoubleType, false),
        StructField("t", DoubleType, false),
        StructField("dof", DoubleType, false),
        StructField("p_t", DoubleType, false))))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Reproducible sampling + corpus sharding for training-data pipelines
  * (SURVEY §2.3 north-star: a 100 TB corpus is never used whole — it is
  * sampled for ablations and sharded for training jobs).
  *
  * Sampling here is DETERMINISTIC HASH sampling, not `df.sample`: a row is
  * kept iff h32(id ++ salt) < rate * P. The decision is a pure function of
  * the row's id, so the same subset comes back on every run, on any
  * engine, regardless of partitioning — the reproducibility property
  * ablation experiments need, and one Spark's RNG-based `sample` (seeded
  * per partition) cannot give once the input layout changes. Changing
  * `salt` draws an independent subset at the same rate.
  *
  * Sharding assigns documents to fixed-token-budget shards in id order via
  * a DISTRIBUTED PREFIX SUM: a naive `sum over (ORDER BY id)` window has
  * an empty partition spec — Spark executes it in ONE partition, which is
  * disqualifying at scale. Instead: range-repartition by id, sort within
  * partitions, take one (partitionId, tokenSum) row per partition to the
  * driver (thousands of rows, not data), prefix-sum those, and stream each
  * partition with its exact global offset. Same result as the window, no
  * single-partition stage.
  */
object Sampling {

  import T.P

  /** Threshold for `rate` over the h32 domain [0, P). */
  private def thresholdOf(rate: Double): Long =
    math.max(0L, math.min(P, (rate * P).toLong))

  private def keyOf(idCol: Column, salt: String): Column =
    T.h32(concat(idCol.cast("string"), lit(salt)))

  /** Keep each row iff h32(id ++ salt) < rate * P — a reproducible,
    * engine-portable ~`rate` subset. Pure narrow filter: pushes to the
    * scan, no shuffle, no state.
    */
  def deterministic(df: DataFrame, idCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.where(keyOf(col(idCol), salt) < thresholdOf(rate))

  /** Per-stratum deterministic sampling: `rates` maps stratum values of
    * `stratumCol` to keep-rates; strata not listed keep `defaultRate`.
    * The rate lookup is a literal CASE chain (strata are few), so this is
    * still one narrow filter — the mixing knob for training-data recipes
    * ("3% of web, 30% of books, all of reference").
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = ""): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdOf(defaultRate))) { case (acc, (value, rate)) =>
        when(col(stratumCol) === lit(value), lit(thresholdOf(rate))).otherwise(acc)
      }
    df.where(keyOf(col(idCol), salt) < threshold)
  }

  /** Balanced per-stratum subset: the `k` rows of each stratum with the
    * smallest h32(id ++ salt), ties broken by id — deterministic "take k
    * per group" for balanced eval/ablation sets. The subset is a pure
    * function of the ids (stable under any partitioning; a new `salt`
    * redraws it), unlike a per-group limit over arbitrary row order.
    * One shuffle on the stratum key; each stratum sorts independently,
    * so the plan holds whenever strata are numerous relative to cores —
    * the data-mixing case (languages × sources), not a 2-group split.
    */
  def perStratumHead(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(keyOf(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  /** (id, tokens, shard): shard = floor(exclusive-prefix-sum(tokens) /
    * budget) over ascending id — documents pack into consecutive
    * fixed-budget shards, a document never splits, id order is preserved
    * within a shard. Deterministic: equal to the one-partition window
    * form, computed scalably (see object doc).
    */
  def shardByBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // persisted so the sum pass and the assignment pass read the SAME
    // materialized partitions (range boundaries are sampled; two separate
    // computations could disagree)
    val slim = graft.util.Caches.persist(
      df.select(col(idCol).cast("long").as("id"),
          col(tokenCol).cast("long").as("tokens"))
        .repartitionByRange(n, col("id"))
        .sortWithinPartitions("id"))
    val nParts = slim.rdd.getNumPartitions
    // one row per partition to the driver — bounded by the partition
    // count, never by the data (same class of driver round-trip as an
    // AQE statistics exchange)
    val perPartition: Array[(Int, Long)] = slim
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var s = 0L
        rows.foreach(s += _.getLong(1))
        Iterator.single((pid, s))
      }
      .collect()
    val offsets = new Array[Long](nParts)
    perPartition.foreach { case (pid, s) =>
      if (pid + 1 < nParts) offsets(pid + 1) = s
    }
    for (i <- 1 until nParts) offsets(i) += offsets(i - 1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val out: Dataset[(Long, Long, Long)] = slim.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = bOffsets.value(pid)
      rows.map { r =>
        val id = r.getLong(0); val t = r.getLong(1)
        val shard = cum / budget // exclusive prefix: where this doc STARTS
        cum += t
        (id, t, shard)
      }
    }
    out.toDF(idCol, tokenCol, "shard")
  }

  /** Deterministic global corpus shuffle: every row gets a stable
    * 0-based `pos` under the total order (h32(id ++ salt), id) — the
    * shuffle a training pipeline runs before sharding so batch
    * composition is decorrelated from ingest order, reproducible across
    * runs and engines, re-dealt per epoch by changing `salt`.
    *
    * Scale shape: ONE range-partitioned sort on the salted hash (the
    * global-sort machinery — no single-partition window anywhere), then
    * positions from per-partition count offsets exactly like
    * [[shardByBudget]]'s prefix sum: one row per PARTITION to the
    * driver, never data. Equal to `row_number() OVER (ORDER BY h, id) - 1`
    * computed scalably.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String = "",
      numPartitions: Int = 0): DataFrame =
    ordinalUnder(df.select(col(idCol).cast("long").as("id"))
      .withColumn("__o", keyOf(col("id"), salt)), idCol, numPartitions)

  /** Scalable global ordinal under an arbitrary total order — every row
    * gets a stable 0-based `pos` under (orderCol, id), with NO
    * single-partition window anywhere (the `row_number() OVER (ORDER BY
    * ...)` that serializes a corpus through one task is the classic
    * scale cliff). The curriculum-ordering primitive: sort documents
    * easy→hard by a difficulty score and hand training a reproducible
    * global sequence.
    */
  def globalOrdinal(df: DataFrame, idCol: String, orderCol: String,
      numPartitions: Int = 0): DataFrame =
    ordinalUnder(df.select(col(idCol).cast("long").as("id"),
      col(orderCol).as("__o")), idCol, numPartitions)

  /** Shared core: global 0-based positions for a slim (id, __o) frame
    * under (__o, id). One range-partitioned sort, then per-PARTITION
    * count offsets — one row per partition to the driver, never data.
    * Equal to `row_number() OVER (ORDER BY __o, id) - 1` computed
    * scalably.
    */
  private def ordinalUnder(slimIn: DataFrame, idCol: String,
      numPartitions: Int): DataFrame = {
    val spark = slimIn.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // persisted: the count pass and the position pass must read the SAME
    // materialized partitions (range boundaries are sampled)
    val slim = graft.util.Caches.persist(
      slimIn.repartitionByRange(n, col("__o"), col("id"))
        .sortWithinPartitions("__o", "id"))
    val nParts = slim.rdd.getNumPartitions
    val counts: Array[(Int, Long)] = slim
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        Iterator.single((pid, rows.size.toLong))
      }
      .collect()
    val offsets = new Array[Long](nParts)
    counts.foreach { case (pid, c) => if (pid + 1 < nParts) offsets(pid + 1) = c }
    for (i <- 1 until nParts) offsets(i) += offsets(i - 1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    slim.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var pos = bOffsets.value(pid)
      rows.map { r => val p = pos; pos += 1; (r.getLong(0), p) }
    }.toDF(idCol, "pos")
  }

  /** Mixture UPSAMPLING: replicate each row `weight(stratum)` times,
    * where fractional weights resolve per row via the same deterministic
    * h32 draw as [[deterministic]] — weight 2.3 yields 2 copies always
    * plus a 3rd copy for the fixed ~30% of ids with h32(id ++ salt) below
    * the fractional threshold. The training-mixture knob for weights
    * ABOVE 1 ("books 2.3 epochs, web 0.8"), complementing [[stratified]]
    * which can only thin. Adds a 0-based `copy` column so replicas stay
    * distinct rows.
    *
    * Pure narrow work: a literal CASE chain for (base, threshold), one
    * `explode(sequence(...))` bounded by ceil(max weight) per row — no
    * shuffle, no state, replayable on any engine. Rows with 0 copies
    * (weight < 1 and the draw above the fraction) are filtered before the
    * explode so the sequence is never descending.
    */
  def upsample(df: DataFrame, stratumCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = ""): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0),
      "weights must be >= 0")
    def baseOf(w: Double): Long = math.floor(w).toLong
    def fracThr(w: Double): Long = thresholdOf(w - math.floor(w))
    val sorted = weights.toSeq.sortBy(_._1)
    val base = sorted.foldLeft(lit(baseOf(defaultWeight))) {
      case (acc, (v, w)) =>
        when(col(stratumCol) === lit(v), lit(baseOf(w))).otherwise(acc)
    }
    val thr = sorted.foldLeft(lit(fracThr(defaultWeight))) {
      case (acc, (v, w)) =>
        when(col(stratumCol) === lit(v), lit(fracThr(w))).otherwise(acc)
    }
    val copies = base + when(keyOf(col(idCol), salt) < thr, 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic train/val/test (or any named) split assignment: adds a
    * `split` column from the row's h32 draw against cumulative fraction
    * thresholds — "80/10/10 by hash" that never changes when the corpus is
    * re-partitioned, re-ordered or appended to (an id keeps its split
    * forever, the property eval hygiene requires; a fresh `salt` redraws).
    * `fractions` is ordered (name, fraction); fractions must sum to <= 1,
    * with any remainder falling to the LAST named split.
    *
    * Pure narrow CASE over the hash — no shuffle, pushes past scans.
    */
  def splitAssign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "at least one split")
    require(fractions.forall(_._2 >= 0) && fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions must be >= 0 and sum to <= 1: $fractions")
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val key = keyOf(col(idCol), salt)
    val expr = fractions.map(_._1).zip(cum).init
      .foldRight(lit(fractions.last._1): Column) { case ((name, c), els) =>
        when(key < lit(thresholdOf(c)), lit(name)).otherwise(els)
      }
    df.withColumn("split", expr)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    * the `k` rows with the largest priority u^(1/w), u = the row's
    * deterministic h32 draw mapped into (0, 1]. A row with twice the
    * weight has exactly twice the inclusion odds in the limit, and the
    * chosen subset is a pure function of (ids, weights, salt) — the
    * reproducible "sample 10k docs proportional to length" primitive.
    *
    * Computed as ln(u)/w (same ordering, better conditioning), rounded
    * to 6dp for engine portability, ties broken by id. Plans as
    * TakeOrderedAndProject: per-partition top-k then a k-row merge —
    * no global sort, driver holds k rows only.
    */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (keyOf(col(idCol), salt).cast("double") + 1d) / (P.toDouble + 1d)
    // + 0.0 normalizes IEEE negative zero: a draw near u = 1 rounds to
    // -0.0 under a C-library round (sign kept) but 0.0 under Spark's
    // BigDecimal HALF_UP — the replay engines must agree bit-for-bit
    val priority = round(log(u) / col(weightCol).cast("double"), 6) + lit(0d)
    df.where(col(weightCol).cast("double") > 0)
      .withColumn("priority", priority)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic negative sampling for contrastive/preference training
    * pairs: `k` pseudo-random negatives per anchor, drawn as a pure
    * function of (anchor id, draw index, salt) — reproducible across
    * runs, engines and layouts, like every draw in this module.
    *
    * Mechanism: the corpus hashes into `nBuckets` buckets, each
    * represented by its min id (one small aggregation); draw i for an
    * anchor picks bucket h32(anchor ++ "#" ++ i ++ salt) and takes its
    * representative. Two kinds of draw are dropped, so an anchor can
    * yield < k pairs: draws that land on the anchor itself, and draws
    * landing in a bucket no id hashed into (possible whenever `nBuckets`
    * exceeds the distinct-id count, or hashing leaves gaps) — the inner
    * join against the representative table has no row to supply. Callers
    * sizing `nBuckets` near the corpus size should expect the latter.
    *
    * Shape at scale: the representative table is `nBuckets` rows and
    * BROADCASTS; the anchor side is a narrow ×k explode — the corpus
    * never shuffles. The trade-off vs a uniform draw over all ids: only
    * `nBuckets` distinct negatives are reachable per salt — size
    * `nBuckets` to the variety the objective needs (one salt per epoch
    * redraws the pool).
    */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      nBuckets: Int = 1024, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val reps = df
      .groupBy((keyOf(col(idCol), salt) % nBuckets).as("__bkt"))
      .agg(min(col(idCol)).as("neg_id"))
    df.select(col(idCol).as("anchor_id"))
      .select(col("anchor_id"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .withColumn("__bkt",
        T.h32(concat(col("anchor_id").cast("string"), lit("#"),
          col("i").cast("string"), lit(salt))) % nBuckets)
      .join(broadcast(reps), "__bkt")
      .where(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("i").cast("long").as("i"), col("neg_id"))
  }

  /** Per-stratum TOKEN budget cap: keep each stratum's documents, in the
    * deterministic (h32(id ++ salt), id) draw order, until the stratum's
    * cumulative token count reaches `budget` — the "at most N tokens per
    * source/domain" recipe knob, the token-denominated complement of
    * [[perStratumHead]]'s row cap. A document is kept iff the tokens
    * BEFORE it in the draw order total under `budget` (so every stratum
    * keeps at least its first draw, and the kept set is a pure function
    * of the ids — re-drawn by salt, stable under any layout).
    *
    * One shuffle on the stratum key; per-stratum window sort — scale-safe
    * whenever strata are numerous relative to cores (sources × languages),
    * the same plan class as [[perStratumHead]].
    */
  def perStratumTokenCap(df: DataFrame, stratumCol: String, idCol: String,
      tokenCol: String, budget: Long, salt: String = ""): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(keyOf(col(idCol), salt).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__cum",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .where(col("__cum") < budget)
      .drop("__cum")
  }

  /** Sequence PACKING: bin documents into fixed-token-budget training
    * sequences (the pre-training step that concatenates short documents up
    * to the context length so no sequence slot is wasted). Output is
    * (id, tokens, bucket, pack): a training sequence is the set of
    * documents sharing (bucket, pack).
    *
    * Mechanism: documents hash into `nBuckets` independent streams
    * (bucket = h32(id ++ salt) % nBuckets — the randomization that
    * decorrelates pack composition from ingest order), and each stream is
    * packed NEXT-FIT in ascending id order: a document that would push the
    * open pack past `budget` closes it and starts the next. A document
    * larger than the whole budget occupies a pack alone (next-fit closes
    * the pack on the following document). Deterministic: a pure function
    * of (id, tokens) — same packs on any engine, any partitioning.
    *
    * Shape at scale: packing is inherently sequential PER STREAM, so the
    * streams ARE the parallelism — one hash shuffle on `bucket`, then a
    * single in-order pass per bucket inside `mapPartitions` (state resets
    * on bucket change; a bucket never spans partitions under hash
    * partitioning). Size `nBuckets` to the cluster (thousands at 100 TB):
    * per-stream work is corpus/nBuckets, no global sort, no window, no
    * driver round-trip of anything.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, nBuckets: Int, salt: String = "",
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val slim = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"),
        (keyOf(col(idCol), salt) % nBuckets).as("bucket"))
      .repartition(n, col("bucket"))
      .sortWithinPartitions("bucket", "id")
    val out: Dataset[(Long, Long, Long, Long)] = slim.mapPartitions { rows =>
      var curBucket = Long.MinValue
      var pack = 0L
      var cum = 0L
      rows.map { r =>
        val id = r.getLong(0); val t = r.getLong(1); val b = r.getLong(2)
        if (b != curBucket) { curBucket = b; pack = 0L; cum = t }
        else if (cum + t > budget) { pack += 1L; cum = t }
        else cum += t
        (id, t, b, pack)
      }
    }
    out.toDF(idCol, tokenCol, "bucket", "pack")
  }

  /** Mixture REBALANCING to target proportions: downsample each stratum so
    * kept tokens are proportional to `targets(stratum)`, keeping as much
    * data as the proportions allow (the binding stratum — the one already
    * at or below its target share — keeps everything; every other stratum
    * thins to match). Strata absent from `targets` are dropped: the recipe
    * declares the mixture. This is [[stratified]] with the rates SOLVED
    * from the corpus instead of hand-picked — the "make the mix 40% en /
    * 20% de / 20% fr / 20% zh" knob a data recipe actually states.
    *
    * rate_s = w_s * c / tok_s with c = min_s(tok_s / w_s), applied as the
    * usual deterministic h32 threshold. All arithmetic is IEEE-double in a
    * fixed operation order, so any engine replays the thresholds exactly.
    *
    * Shape at scale: one map-side-combined aggregate bounded by the
    * stratum count, a broadcast join of that tiny rate table, then a
    * narrow filter — the corpus itself never shuffles and never reaches
    * the driver.
    */
  def rebalance(df: DataFrame, stratumCol: String, idCol: String,
      tokenCol: String, targets: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0), "target weights must be > 0")
    val weight = targets.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (value, w)) =>
        when(col(stratumCol) === lit(value), lit(w)).otherwise(acc)
      }
    val toks = df
      .select(col(stratumCol).as("__s"), weight.as("__w"),
        col(tokenCol).cast("long").as("__t"))
      .where(col("__w").isNotNull)
      .groupBy("__s", "__w").agg(sum("__t").as("__tok"))
    val cmin = toks.agg(
      min(col("__tok").cast("double") / col("__w")).as("__cmin"))
    val rates = toks.crossJoin(broadcast(cmin))
      .select(col("__s"),
        floor(col("__w") * col("__cmin") / col("__tok").cast("double")
          * lit(P.toDouble)).cast("long").as("__thr"))
    df.join(broadcast(rates), col(stratumCol) === col("__s"))
      .where(keyOf(col(idCol), salt) < col("__thr"))
      .drop("__s", "__thr")
  }

  /** Temperature-scaled mixture: [[rebalance]] with the target weights
    * COMPUTED from the corpus instead of hand-picked — stratum `s` with
    * natural token share `p_s` gets weight `p_s^alpha` (rounded to 6dp),
    * the multinomial temperature-sampling rule of multilingual and
    * domain-mixing pre-training (alpha = 1 keeps natural proportions,
    * alpha -> 0 approaches uniform; 0.5 and 0.3 are the conventional
    * settings). Rates follow the rebalance contract: the stratum with
    * the largest weight-relative deficit keeps everything, the rest
    * downsample by the deterministic h32 draw, so the surviving token
    * mass is proportional to `p_s^alpha` and no stratum upsamples.
    *
    * The 6dp weight rounding is the cross-engine determinism contract:
    * `pow` is not required to be correctly rounded by IEEE 754, so raw
    * Java/libm results may differ in the last ulp — after HALF_UP 6dp
    * rounding (`+ 0.0` for the negative-zero rule) both engines feed
    * identical doubles into identical threshold arithmetic.
    *
    * Shape at scale: identical to [[rebalance]] — one map-side-combined
    * aggregate bounded by the stratum count, two broadcasts of
    * stratum-sized tables, then a narrow filter; the corpus never
    * shuffles.
    */
  def temperatureRebalance(df: DataFrame, stratumCol: String, idCol: String,
      tokenCol: String, alpha: Double, salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val toks = df
      .select(col(stratumCol).as("__s"), col(tokenCol).cast("long").as("__t"))
      .groupBy("__s").agg(sum("__t").as("__tok"))
    val tot = toks.agg(sum("__tok").as("__tot"))
    val wts = toks.crossJoin(broadcast(tot))
      .select(col("__s"), col("__tok"),
        (round(pow(col("__tok").cast("double") / col("__tot").cast("double"),
          lit(alpha)), 6) + lit(0d)).as("__w"))
    val cmin = wts.agg(
      min(col("__tok").cast("double") / col("__w")).as("__cmin"))
    val rates = wts.crossJoin(broadcast(cmin))
      .select(col("__s"),
        floor(col("__w") * col("__cmin") / col("__tok").cast("double")
          * lit(P.toDouble)).cast("long").as("__thr"))
    df.join(broadcast(rates), col(stratumCol) === col("__s"))
      .where(keyOf(col(idCol), salt) < col("__thr"))
      .drop("__s", "__thr")
  }

  /** Global top-fraction selection: keep the ceil(p * n) rows with the
    * highest score, ties to the smaller id — the "keep the best 10% by
    * quality score" calibration step, where the CUT-OFF is a target
    * retention RATE rather than a hand-picked threshold (the threshold
    * drifts every corpus refresh; the rate is the contract).
    * Output is (id, score, rank) with rank the 1-based global position
    * under (score desc, id asc).
    *
    * Shape at scale: the same distributed-rank machinery as
    * [[deterministicShuffle]] — one range-partitioned sort on
    * (score desc, id), then global ranks from per-partition COUNT offsets
    * (one row per partition to the driver, never data; n falls out of the
    * same pass, so no separate count job). Equal to
    * `row_number() OVER (ORDER BY score DESC, id)` + a count, with no
    * single-partition window anywhere.
    */
  def topFraction(df: DataFrame, scoreCol: String, idCol: String,
      p: Double, numPartitions: Int = 0): DataFrame = {
    require(p > 0 && p <= 1, s"p must be in (0, 1], got $p")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // persisted: the count pass and the rank pass must read the SAME
    // materialized partitions (range boundaries are sampled)
    val slim = graft.util.Caches.persist(
      df.select(col(idCol).cast("long").as("id"),
          col(scoreCol).cast("double").as("score"))
        .repartitionByRange(n, col("score").desc, col("id"))
        .sortWithinPartitions(col("score").desc, col("id")))
    val nParts = slim.rdd.getNumPartitions
    val counts: Array[(Int, Long)] = slim
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        Iterator.single((pid, rows.size.toLong))
      }
      .collect()
    val total = counts.map(_._2).sum
    val k = math.ceil(p * total).toLong
    val offsets = new Array[Long](nParts)
    counts.foreach { case (pid, c) => if (pid + 1 < nParts) offsets(pid + 1) = c }
    for (i <- 1 until nParts) offsets(i) += offsets(i - 1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    slim.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var rank = bOffsets.value(pid)
      rows.flatMap { r =>
        rank += 1
        if (rank <= k) Some((r.getLong(0), r.getDouble(1), rank)) else None
      }
    }.toDF(idCol, "score", "rank")
  }

  /** Per-shard MANIFEST — the "data card" a shipped training-shard set
    * carries: one row per [[shardByBudget]] shard with its document
    * count, exact token sum, and an order-insensitive id checksum
    * (Σ h32(id) mod P — any dropped/duplicated/foreign document moves
    * it), so a consumer can verify a shard without rereading members.
    *
    * Shape at scale: the sharding pass plus ONE map-side-combined
    * aggregation on the shard id; the checksum accumulates in
    * DECIMAL(38,0), exact under any combine order.
    */
  def shardManifest(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame =
    shardByBudget(df, idCol, tokenCol, budget)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        (sum(keyOf(col(idCol), "").cast("decimal(38,0)")) % P)
          .cast("long").as("id_checksum"))

  /** LEAKAGE-SAFE train/val/test split: assignment is a pure function of
    * the row's NEAR-DUP CLUSTER label (a `(doc_id, component)` table,
    * e.g. [[Dedup.connectedComponents]] over MinHash pairs), not of the
    * row id — so every member of a duplicate cluster lands in the same
    * split and no eval example has a near-copy in training (the classic
    * benchmark-leakage failure mode of id-hash splits). Rows in no
    * cluster split by their own id, which equals [[splitAssign]] there.
    *
    * Shape at scale: one id-keyed join against the (small) component
    * table, then the same narrow CASE-over-h32-thresholds as
    * [[splitAssign]] — no extra shuffle beyond the label join.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String,
      components: DataFrame, fractions: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    val comp = components.select(col("doc_id").as(idCol),
      col("component").as("__grp"))
    df.join(comp, Seq(idCol), "left")
      .withColumn("__grp", coalesce(col("__grp"), col(idCol)))
      .transform(splitAssign(_, "__grp", fractions, salt))
      .drop("__grp")
  }

  /** Per-STRATUM top fraction: within each stratum keep the
    * ceil(p · n_stratum) best rows under (score desc, id) — the
    * "top 20% by quality per domain" recipe knob, which a single global
    * cut ([[topFraction]]) cannot express when score scales differ
    * across strata. Appends `rank` (1-based within the stratum).
    *
    * Shape at scale: ONE stratum-cardinality count aggregate broadcast
    * back, one stratum-keyed row_number window. The window partitions by
    * the stratum key — fine while strata are numerous relative to
    * executor memory; a single gigantic stratum degenerates to the
    * global problem, where [[topFraction]]'s range-partitioned form is
    * the tool.
    */
  def topFractionPerStratum(df: DataFrame, stratumCol: String,
      scoreCol: String, idCol: String, p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"p must be in (0, 1], got $p")
    val counts = df.groupBy(col(stratumCol))
      .agg(ceil(count(lit(1)) * lit(p)).cast("long").as("__k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.join(broadcast(counts), stratumCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= col("__k"))
      .drop("__k")
  }

  /** Systematic weighted sampling: draw `n` slots proportional to
    * `weightCol` (positive long weights — token counts, byte sizes) with
    * ONE pass and zero randomness at run time. Rows are laid on the
    * cumulative-weight axis in the reproducible order (h32(id ++ salt),
    * id) — the [[deterministicShuffle]] order, so adjacency on the axis
    * is decorrelated from ingest order — and a slot lands every W/n
    * units: row i is selected with multiplicity
    * n_slots = floor(cumEnd·n / W) − floor(cumStart·n / W), the
    * classic systematic (fixed-interval) sampler. Σ n_slots = n exactly;
    * a row heavier than W/n can claim several slots (its `n_slots` is
    * its replication count — the upsampling semantics weighted draws
    * need). Rows with weight <= 0 or NULL are dropped. Changing `salt`
    * re-deals the axis order for an independent draw.
    *
    * Versus [[weightedTopK]] (heaviest-k) and [[deterministic]]
    * (uniform rate): this is the estimator a token-budgeted corpus
    * recipe wants — inclusion probability ∝ weight, variance far below
    * independent weighted draws, and exactly `n` slots out, not an
    * expectation.
    *
    * Scale shape: the [[shardByBudget]] distributed prefix sum — one
    * range-partitioned sort on (h, id), one (partitionId, weightSum) row
    * per partition to the driver, offsets broadcast back, then a NARROW
    * per-partition pass. Slot boundaries are exact BigInt products
    * (cum·n overflows a long once W·n passes 2^63 — a 10 T-token corpus
    * times a million slots, the normal case at target scale); the oracle
    * replays them as HUGEINT.
    */
  def systematicWeighted(df: DataFrame, idCol: String, weightCol: String,
      n: Long, salt: String = "", numPartitions: Int = 0): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    val nP = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val slim = graft.util.Caches.persist(
      df.select(col(idCol).cast("long").as("id"),
          col(weightCol).cast("long").as("w"),
          keyOf(col(idCol), salt).as("h"))
        .where(col("w") > 0)
        .repartitionByRange(nP, col("h"), col("id"))
        .sortWithinPartitions("h", "id"))
    val nParts = slim.rdd.getNumPartitions
    val perPartition: Array[(Int, Long)] = slim
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var s = 0L
        rows.foreach(s += _.getLong(1))
        Iterator.single((pid, s))
      }
      .collect()
    val totalW = perPartition.map(_._2).sum
    val offsets = new Array[Long](nParts)
    perPartition.foreach { case (pid, s) =>
      if (pid + 1 < nParts) offsets(pid + 1) = s
    }
    for (i <- 1 until nParts) offsets(i) += offsets(i - 1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val bigN = BigInt(n)
    val bigW = BigInt(totalW)
    slim.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = BigInt(bOffsets.value(pid))
      rows.flatMap { r =>
        val start = cum
        cum += r.getLong(1)
        val slots = (cum * bigN / bigW - start * bigN / bigW).toLong
        if (slots >= 1) Some((r.getLong(0), r.getLong(1), slots)) else None
      }
    }.toDF(idCol, "weight", "n_slots")
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): doc -> argmax over shards s of h32(id ++ ":" ++ s),
    * ties to the SMALLEST s. The property that matters for corpus
    * maintenance: growing k -> k+1 shards moves ONLY the docs whose
    * argmax is the NEW shard (~1/(k+1) of the corpus) — every other
    * assignment is untouched, because adding a candidate never changes
    * the winner among the old ones. Mod-hashing (`h % k`) reshuffles
    * (k-1)/k of the corpus on the same change; this is the difference
    * between re-writing one new shard and re-writing the lake.
    *
    * Pure narrow projection (a k-wide literal struct-max per row): no
    * shuffle, no state, pushes to the scan side of whatever follows.
    *
    * Output: input columns + `shard` (0-based).
    */
  def rendezvousShard(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"shard count must be >= 1, got $k")
    // array_max on struct(h, -s): max h wins; on an h tie the larger -s
    // (= smaller s) wins — total order, engine-portable
    val best = array_max(transform(sequence(lit(0), lit(k - 1)), s =>
      struct(
        T.h32(concat(col(idCol).cast("string"), lit(":"), s.cast("string")))
          .as("h"),
        (-s).cast("long").as("negs"))))
    df.withColumn("shard", (-best.getField("negs")).cast("long"))
  }

  /** Data Selection via Importance Resampling scores (Xie et al. 2023,
    * public NeurIPS paper): rank raw documents by how target-like their
    * hashed-n-gram profile is. Features are whitespace tokens hashed into
    * `buckets` buckets (h32 mod B); the target distribution is estimated
    * from the rows matching `targetPred`, the source distribution from the
    * WHOLE input (DSIR's raw-vs-target contrast), both Laplace-smoothed
    * (+1 per bucket). A document scores the sum over its tokens of
    * log(p_target[bucket] / p_source[bucket]) — high = looks like the
    * target domain, the standard cheap proxy for "high-quality pretraining
    * data that resembles the trusted corpus".
    *
    * Determinism contract: the per-bucket log-ratio is quantized ONCE to
    * fixed-point micro-units (round(ln(pt/ps) * 1e6) as long); a doc's
    * score is an exact LONG sum of those — order-insensitive, so any
    * combine order (and any engine) reproduces it bit-for-bit. The only
    * float steps (ln, one division) happen per BUCKET (B values, not N),
    * replayed identically by the oracle.
    *
    * Scale shape: one token explode feeding a B-bounded count (map-side
    * combined), the B-row ratio table joins back broadcast (B ~ hundreds;
    * Spark picks broadcast via AQE), one groupBy doc. Linear in corpus
    * token volume; no driver collect, no all-pairs, nothing holds more
    * than B rows of state.
    *
    * Output: (doc_id, n_tokens, score) for EVERY input row — selection is
    * a downstream `topFraction`/`weightedTopK` over `score`. Rows with no
    * tokens (empty text) keep score 0.0.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 128): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val b = lit(buckets)
    val toks = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"), targetPred.as("__tgt"),
          explode(split(col(textCol), " ", -1)).as("__w"))
        .where(length(col("__w")) > 0)
        .select(col("doc_id"), col("__tgt"), (T.h32(col("__w")) % b).as("__b")))
    val cnt = toks.groupBy("__b").agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"),
      count(lit(1)).as("__sc"))
    // Totals as a broadcast one-row aggregate (not an empty-partition
    // window): cnt is B-bounded, the totals row is a scalar.
    val tots = cnt.agg(sum(col("__tc")).as("__tt"), sum(col("__sc")).as("__st"))
    val lr = cnt.crossJoin(broadcast(tots))
      .select(col("__b"),
        round(
          (log((col("__tc") + 1).cast("double") / (col("__tt") + b)) -
           log((col("__sc") + 1).cast("double") / (col("__st") + b))) *
            lit(1000000d)).cast("long").as("__lr"))
    val scored = toks.join(lr, "__b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("__fix"))
      .select(col("doc_id"), col("n_tokens"),
        (round(col("__fix").cast("double") / 1000000d, 6) + lit(0d)).as("score"))
    // Keep token-less rows (score 0): DSIR must rank every candidate.
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0d)).as("score"))
  }

  /** Pareto-front (skyline) selection over two MAXIMIZED criteria — the
    * multi-objective data-selection primitive ("highest quality AND
    * least duplicated", "longest AND most novel"): keep every row no
    * other row strictly dominates, i.e. drop r iff some s has
    * s.x ≥ r.x ∧ s.y ≥ r.y with at least one strict. A single scalar
    * blend (w·x + (1−w)·y) pre-commits to a trade-off; the front
    * surfaces EVERY undominated trade-off and lets the recipe choose.
    *
    * Equivalent prefix form (no pair enumeration): r survives iff
    * r.y == maxY(r.x)  (nothing at the same x strictly above it) and
    * r.y > max over {x' > r.x} of maxY(x') (nothing strictly to the
    * upper-right). Ties on BOTH coordinates survive together — identical
    * points do not dominate each other.
    *
    * Rows with a NULL x or y have no position on either axis and are
    * dropped. Columns must be numeric; dominance runs on native types.
    *
    * Shape at scale: per-x-level max-y first (map-side-combined — the
    * shuffle carries one partial per distinct x per partition, never the
    * data), then the [[Drift.ksStatistic]] distributed prefix over
    * DESCENDING x (per-partition window + partition-count-bounded
    * offsets broadcast back), and one x-keyed join of the level verdicts
    * back to the rows. No global single-partition window, no all-pairs
    * anywhere; output is front-sized.
    */
  def paretoFront(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val lv = rows.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__my"))
    val n = spark.sessionState.conf.numShufflePartitions
    // persisted: the offset pass and the prefix pass must observe the
    // SAME materialized range partitions (boundaries are sampled)
    val parts = graft.util.Caches.persist(
      lv.repartitionByRange(n, col("__x").desc)
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parts.withColumn("__lmax", max("__my").over(w))
    // one row per partition to the driver — bounded by the partition
    // count, never by the data (the shardByBudget offsets precedent)
    val totals = parts.groupBy("__pid").agg(max("__my").as("__pm"))
      .collect().map(r => (r.getInt(0), r.get(1))).sortBy(_._1)
    var run: Any = null
    val offRows = totals.map { case (pid, pm) =>
      val r = Row(pid, run)
      run = (run, pm) match {
        case (null, b) => b
        case (a, null) => a
        case (a: Comparable[Any] @unchecked, b) =>
          if (a.compareTo(b) >= 0) a else b
      }
      r
    }
    val yField = lv.schema("__my").copy(name = "__off", nullable = true)
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, false), yField)))
    val verdict = local.join(broadcast(offDf), "__pid")
      .select(col("__x"), col("__my"),
        greatest(col("__lmax"), col("__off")).as("__strict"))
    rows.join(verdict, rows(xCol) === verdict("__x"))
      .where(col(yCol) === col("__my") &&
        (col("__strict").isNull || col(yCol) > col("__strict")))
      .select(rows.columns.map(rows(_)): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import scala.jdk.CollectionConverters._

import graft.functions.{TextFunctions => T}

/** Model-based quality filtering: a hashed-unigram multinomial Naive
  * Bayes classifier trained ON THE CORPUS ITSELF from a labeling
  * predicate — the "train a classifier on trusted sources, keep what
  * scores like them" curation stage (the GPT-3 WebText-similarity
  * filter; the same shape as fastText's linear text classifier with the
  * n-gram table replaced by a fixed hashed-bucket table).
  *
  * Relationship to [[Sampling.importanceWeights]] (DSIR): DSIR scores
  * target-vs-CORPUS token ratios for importance RESAMPLING; this is a
  * proper two-class generative classifier — class-conditional token
  * likelihoods plus a class prior — producing a calibrated log-odds
  * decision boundary at 0 for FILTERING. Both share the engine's
  * determinism contract: every per-bucket log-ratio and the prior are
  * quantized ONCE to fixed-point micro-nats, so each document's score
  * is an exact, order-free long sum any engine replays bit-for-bit.
  */
object Classify {

  /** Train-and-score in one declarative plan. `positivePred` labels the
    * training split (e.g. `col("source").isin(trusted: _*)`); every doc
    * is then scored
    *
    *   log_odds = ln((dp+1)/(dn+1)) + Σ_tok [ ln((pc_b+1)/(pt+B))
    *                                        − ln((nc_b+1)/(nt+B)) ]
    *
    * with pc_b/nc_b the bucket's token count inside the
    * positive/negative class, pt/nt the class token totals, dp/dn the
    * class doc counts (add-one smoothing throughout, so an empty class
    * degrades gracefully instead of dividing by zero), and B = `buckets`
    * (feature hashing: the vocabulary folds into B buckets, which bounds
    * the model table — and therefore the broadcast — at ANY corpus
    * size; collisions trade a little accuracy, the fastText trick).
    *
    * Output: (doc_id, n_tokens, log_odds 6dp, pred) for EVERY input doc
    * (token-less docs score the prior alone). `pred` is log_odds > 0 —
    * "reads more like the positive class than not".
    *
    * Shape at scale: one token explode + one B-bounded count, model and
    * totals join back as broadcast one-row/B-row tables, per-doc score
    * is a map-side-combinable long sum — the corpus shuffles once on the
    * doc key and never again. Scoring a NEW batch against a frozen model
    * is the same plan minus the count (persist the B-row table).
    */
  def naiveBayes(df: DataFrame, idCol: String, textCol: String,
      positivePred: Column, buckets: Int = 128): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val b = lit(buckets)
    val toks = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"), positivePred.as("__pos"),
          explode(split(col(textCol), " ", -1)).as("__w"))
        .where(length(col("__w")) > 0)
        .select(col("doc_id"), col("__pos"), (T.h32(col("__w")) % b).as("__b")))
    val cnt = toks.groupBy("__b").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__pc"),
      sum(when(col("__pos"), 0L).otherwise(1L)).as("__nc"))
    val tots = cnt.agg(sum(col("__pc")).as("__pt"), sum(col("__nc")).as("__nt"))
    // prior from DOC counts (quantized to micro-nats like the ratios)
    val prior = df.agg(
      sum(when(positivePred, 1L).otherwise(0L)).as("__dp"),
      sum(when(positivePred, 0L).otherwise(1L)).as("__dn"))
      .select(round(log((col("__dp") + 1).cast("double") /
        (col("__dn") + 1)) * lit(1000000d)).cast("long").as("__prior"))
    val lr = cnt.crossJoin(broadcast(tots))
      .select(col("__b"),
        round(
          (log((col("__pc") + 1).cast("double") / (col("__pt") + b)) -
           log((col("__nc") + 1).cast("double") / (col("__nt") + b))) *
            lit(1000000d)).cast("long").as("__lr"))
    val scored = toks.join(lr, "__b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("__fix"))
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (round((col("__prior") + coalesce(col("__fix"), lit(0L)))
          .cast("double") / 1000000d, 6) + lit(0d)).as("log_odds"))
      .withColumn("pred", col("log_odds") > 0)
  }

  /** Exact ROC-AUC of `scoreCol` against boolean `labelCol` — the
    * Mann–Whitney pair statistic: the fraction of (positive, negative)
    * pairs the score orders correctly, ties counting half. This is the
    * threshold-free readout a quality-filter tuning loop runs on
    * [[naiveBayes]] (or any heuristic score) before picking a cut-off:
    * AUC 0.5 = the score carries nothing, 1.0 = perfect separation.
    *
    * Exact by construction: the numerator is carried ×2 as the INTEGER
    *
    *   num2 = Σ over score levels  np·(2·cumNegBelow + nn)
    *
    * (np/nn the level's positive/negative counts, cumNegBelow the
    * negatives at strictly smaller scores) and AUC = num2 / (2·nP·nN)
    * is the only double division — order-free, engine-replayable.
    * NULL scores and NULL labels are excluded (they have no position on
    * the score axis / no class). Degenerate one-class inputs yield a
    * NULL auc rather than 0/0.
    *
    * Shape at scale: per-score-level counts first (map-side-combined —
    * the shuffle carries one partial per distinct score per partition,
    * never the data), then the [[Drift.ksStatistic]] distributed CDF:
    * per-partition window cumsums within range partitions plus
    * partition-count-bounded offsets collected and broadcast back. No
    * global single-partition window at any size. Output is ONE row
    * (n_pos, n_neg, auc 6dp).
    */
  def rocAuc(scored: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val spark = scored.sparkSession
    val lv = scored
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("v"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__nn"))
    val n = spark.sessionState.conf.numShufflePartitions
    // persisted: the offset pass and the cumsum pass must observe the
    // SAME materialized range partitions (boundaries are sampled)
    val parts = graft.util.Caches.persist(
      lv.repartitionByRange(n, col("v"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("v")
    val local = parts.withColumn("__cn", sum("__nn").over(w)) // inclusive
    val totals = parts.groupBy("__pid")
      .agg(sum("__np").as("tp"), sum("__nn").as("tn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var (nP, nN) = (0L, 0L)
    val offRows = totals.map { case (pid, tp, tn) =>
      val r = Row(pid, nN); nP += tp; nN += tn; r
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__on", LongType, false))))
    // cross products in DECIMAL(38,0): np·cum overflows a long once the
    // corpus passes ~3e9 rows — the 100 TB case, not a corner
    val dec = "decimal(38,0)"
    val num2 = local.join(broadcast(offDf), "__pid")
      .select((col("__np").cast(dec) *
        ((col("__cn") + col("__on") - col("__nn")).cast(dec) * 2
          + col("__nn").cast(dec))).as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0).cast(dec)).as("__num2"))
    num2.select(lit(nP).as("n_pos"), lit(nN).as("n_neg"),
      (if (nP == 0L || nN == 0L) lit(null).cast("double")
       else round(col("__num2").cast("double")
         / lit(2d * nP.toDouble * nN.toDouble), 6)).as("auc"))
  }

  /** Confusion-matrix metrics of boolean `predCol` against boolean
    * `labelCol` in ONE map-side-combined scan: (tp, fp, fn, tn,
    * accuracy, precision, recall, f1), ratios 6dp with NULL on an empty
    * denominator (no predicted positives → precision undefined, not 0).
    * The companion readout to [[rocAuc]] once a threshold IS chosen.
    * Rows with a NULL label or prediction are excluded.
    */
  def confusion(scored: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val l = col(labelCol)
    val p = col(predCol)
    val cnt = scored.where(l.isNotNull && p.isNotNull).agg(
      sum(when(l && p, 1L).otherwise(0L)).as("tp"),
      sum(when(!l && p, 1L).otherwise(0L)).as("fp"),
      sum(when(l && !p, 1L).otherwise(0L)).as("fn"),
      sum(when(!l && !p, 1L).otherwise(0L)).as("tn"))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
    cnt.select(
      coalesce(col("tp"), lit(0L)).as("tp"),
      coalesce(col("fp"), lit(0L)).as("fp"),
      coalesce(col("fn"), lit(0L)).as("fn"),
      coalesce(col("tn"), lit(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(col("tp") * 2, col("tp") * 2 + col("fp") + col("fn"))
          .as("f1"))
  }

  /** Reliability table for score calibration: scores bucket by
    * `floor(score / binWidth)` and each bin reports its size, positive
    * count, positive rate, and exact mean score — "do docs scoring in
    * [2, 3) actually come from the trusted class ~that often?". Run on
    * [[naiveBayes]] log-odds it is the calibration readout behind
    * threshold choice; a monotone pos_rate over bins is what makes a
    * single cut-off defensible. Mean scores fold through ×10^6
    * fixed-point DECIMAL sums (scores are 6dp by the engine contract),
    * so the mean is exact under any accumulation order. NULL scores or
    * labels are excluded. Output per non-empty bin: (bin, n, n_pos,
    * pos_rate 6dp, mean_score 6dp).
    *
    * Shape at scale: one map-side-combined grouped aggregate; the
    * shuffle carries one partial per bin per partition.
    */
  def reliabilityBins(scored: DataFrame, labelCol: String,
      scoreCol: String, binWidth: Double = 1.0): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val dec = "decimal(38,0)"
    scored.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(floor(col(scoreCol).cast("double") / lit(binWidth))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(round(col(scoreCol).cast("double") * 1000000d).cast(dec))
          .as("__s"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        (round(col("__s").cast("double") / col("n").cast("double")
          / 1000000d, 6) + lit(0d)).as("mean_score"))
  }

  /** Cohen's kappa between two categorical labelings of the same rows —
    * chance-corrected agreement, the label-quality gauge for training
    * data with multiple annotation sources (two heuristic labelers, a
    * model vs. a rubric, annotator vs. annotator). Raw agreement po
    * flatters skewed label sets; kappa subtracts the agreement two
    * INDEPENDENT labelers with these marginals would reach by luck:
    *
    *   kappa = (n·diag − Σ_k rowTot_k·colTot_k) / (n² − Σ_k rowTot_k·colTot_k)
    *
    * carried as exact DECIMAL(38,0) integers with one final double
    * division (and po = diag/n, pe = Σ/n² beside it, each a single
    * division, 6dp). NULL labels form their own category (a labeler
    * going silent IS a disagreement signal); rows where both are NULL
    * agree. Degenerate pe = 1 (both labelers constant and equal) yields
    * NULL kappa. Output is ONE row: (n, n_agree, po, pe, kappa).
    *
    * Shape at scale: one map-side-combined (a, b) cell count — the
    * shuffle carries one partial per label pair per partition — then
    * category-bounded marginal rollups joined null-safely. The data
    * never shuffles.
    */
  def agreement(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = graft.util.Caches.persist(
      df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
        .agg(count(lit(1)).as("__c")))
    val dec = "decimal(38,0)"
    val rowTot = cells.groupBy(col("__a").as("__k"))
      .agg(sum("__c").as("__ra"))
    val colTot = cells.groupBy(col("__b").as("__k"))
      .agg(sum("__c").as("__rb"))
    val peNum = rowTot.join(colTot, rowTot("__k") <=> colTot("__k"))
      .agg(coalesce(sum(col("__ra").cast(dec) * col("__rb").cast(dec)),
        lit(0).cast(dec)).as("__pe"))
    val base = cells.agg(
      coalesce(sum("__c"), lit(0L)).as("__n"),
      coalesce(sum(when(col("__a") <=> col("__b"), col("__c"))
        .otherwise(0L)), lit(0L)).as("__d"))
    base.crossJoin(broadcast(peNum))
      .select(col("__n").as("n"), col("__d").as("n_agree"),
        when(col("__n") > 0,
          round(col("__d").cast("double") / col("__n").cast("double"), 6))
          .as("po"),
        when(col("__n") > 0,
          round(col("__pe").cast("double")
            / (col("__n").cast("double") * col("__n").cast("double")), 6))
          .as("pe"),
        when(col("__n") > 0 &&
            col("__n").cast(dec) * col("__n").cast(dec) =!= col("__pe"),
          round((col("__n").cast(dec) * col("__d").cast(dec) - col("__pe"))
            .cast("double") /
            (col("__n").cast(dec) * col("__n").cast(dec) - col("__pe"))
              .cast("double"), 6) + lit(0d))
          .as("kappa"))
  }

  /** Krippendorff's alpha (Krippendorff 1970/2004), nominal metric —
    * the multi-rater agreement [[agreement]]'s Cohen kappa cannot give:
    * kappa is pinned to exactly TWO raters with no missing labels,
    * while real annotation (and ensemble-labeler auditing) has R >= 2
    * raters each free to abstain. Alpha compares observed to expected
    * disagreement over all PAIRABLE values (units with >= 2 labels):
    *
    *   alpha = 1 − (n−1)·Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1)
    *               / (n² − Σ_c n_c²)
    *
    * with n_uc = unit u's count of value c, m_u = u's label count, and
    * n_c/n totals over pairable units only. Every per-unit division is
    * made EXACT by scaling with L = lcm(1..R−1) (m_u − 1 always
    * divides L), so the whole statistic is two exact integer sums and
    * ONE final double division — bit-deterministic under any
    * partitioning and replayable in DuckDB. All labels in one category
    * (zero expected disagreement) leaves alpha indeterminate → NULL,
    * never 1.0.
    *
    * Input: one row per unit, one column per rater (null = abstained);
    * values compared as strings. Output ONE row: (n_units pairable,
    * n_values, n_pairable, alpha 6dp). Shape at scale: one narrow
    * explode (R values per unit), two map-side-combined aggregates, a
    * broadcast-sized per-value total table — no window, no pairs, no
    * driver data loops. Products run in decimal(38,0), so the integer
    * path cannot wrap below ~1e19 labels.
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
      raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2,
      s"need >= 2 rater columns, got ${raterCols.size}")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = (1 until raterCols.size)
      .foldLeft(1L)((acc, i) => acc / gcd(acc, i.toLong) * i)
    val dec = "decimal(38,0)"
    val vals = df.select(col(unitCol).as("__u"),
        explode(array(raterCols.map(c => col(c).cast("string")): _*))
          .as("__v"))
      .where(col("__v").isNotNull)
    val uc = graft.util.Caches.persist(
      vals.groupBy("__u", "__v").agg(count(lit(1)).as("__c")))
    val pairable = graft.util.Caches.persist(
      uc.groupBy("__u")
        .agg(sum("__c").as("__m"),
          sum(col("__c") * col("__c")).as("__s"))
        .where(col("__m") >= 2))
    val terms = pairable.agg(
      count(lit(1)).as("__n_units"),
      coalesce(sum(expr(s"${L}L div (__m - 1)").cast(dec)
        * (col("__m") * col("__m") - col("__s")).cast(dec)),
        lit(0).cast(dec)).as("__al"))
    val vc = uc.join(pairable.select("__u"), Seq("__u"))
      .groupBy("__v").agg(sum("__c").as("__nc"))
    val tot = vc.agg(count(lit(1)).as("__nv"),
      coalesce(sum("__nc"), lit(0L)).as("__n"),
      coalesce(sum(col("__nc").cast(dec) * col("__nc").cast(dec)),
        lit(0).cast(dec)).as("__q"))
    val de = (col("__n").cast(dec) * col("__n").cast(dec) - col("__q"))
    tot.crossJoin(broadcast(terms))
      .select(col("__n_units").as("n_units"), col("__nv").as("n_values"),
        col("__n").as("n_pairable"),
        when(de > 0,
          round(lit(1.0)
            - ((col("__n") - 1).cast(dec) * col("__al")).cast("double")
              / (lit(L).cast(dec) * de).cast("double"), 6) + lit(0d))
          .as("alpha"))
  }

  /** McNemar's test (McNemar 1947) — the PAIRED two-classifier
    * comparison [[rocAuc]]/[[confusion]] cannot give: when models A
    * and B are evaluated on the SAME examples, only the DISCORDANT
    * pairs carry information (b = A right & B wrong, c = A wrong & B
    * right), and the unpaired two-proportion z wastes the pairing.
    * χ² = (b−c)²/(b+c) on dof 1, plus the continuity-corrected
    * (|b−c|−1)²/(b+c) (Edwards 1948 — the small-count default; read
    * `p_cc` unless b+c is large). b+c = 0 (no disagreements) pins
    * both p = 1 (identical models, nothing to test — NULL χ²).
    *
    * `labelCol`/`predACol`/`predBCol` are booleans (rows with any NULL
    * drop); "right" means pred == label. Determinism: four exact long
    * cell counts from ONE map-side-combined aggregate; χ²/p are scalar
    * expressions over them (dof 1 unrolls in-plan via the pinned
    * closed-form χ² survival). Output ONE row: (n, both_right,
    * both_wrong, a_only, b_only, chi2, p_value, chi2_cc, p_cc).
    */
  def mcnemar(df: DataFrame, labelCol: String, predACol: String,
      predBCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val a = col(predACol).cast("boolean") <=> y
    val b = col(predBCol).cast("boolean") <=> y
    val cells = df
      .where(col(labelCol).isNotNull && col(predACol).isNotNull
        && col(predBCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("both_right"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("both_wrong"),
        sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("b_only"))
    val bb = col("a_only").cast("double")
    val cc = col("b_only").cast("double")
    val disc = bb + cc
    val chi2 = (bb - cc) * (bb - cc) / disc
    val ccNum = (abs(bb - cc) - lit(1.0))
    // continuity correction floors at 0 when |b-c| < 1 (b = c ± 0)
    val chi2cc = when(abs(bb - cc) > 1.0, ccNum * ccNum / disc)
      .otherwise(lit(0.0))
    val P = graft.functions.PValues
    cells.select(col("n"), col("both_right"), col("both_wrong"),
      col("a_only"), col("b_only"),
      when(disc > 0, round(chi2, 6) + lit(0d)).as("chi2"),
      when(disc > 0,
        round(P.chiSqSurvivalCol(chi2, 1), 6) + lit(0d))
        .otherwise(lit(1d)).as("p_value"),
      when(disc > 0, round(chi2cc, 6) + lit(0d)).as("chi2_cc"),
      when(disc > 0,
        round(P.chiSqSurvivalCol(chi2cc, 1), 6) + lit(0d))
        .otherwise(lit(1d)).as("p_cc"))
  }

  /** Split conformal prediction interval (Vovk et al.; the
    * distribution-free finite-sample coverage recipe): from a
    * CALIBRATION slice's absolute residuals |y − ŷ|, the (1−α)
    * interval half-width is the r-th smallest residual with
    * r = ⌈(n_cal + 1)(1 − α)⌉ (clamped to n_cal) — then ŷ ± q covers a
    * fresh point with probability ≥ 1 − α, NO distributional
    * assumptions, any underlying model. The readout every
    * "model-scored corpus + threshold" curation decision should carry:
    * q says how wrong the score can be, coverage on `test` audits the
    * guarantee held out of sample.
    *
    * Residuals snap to ×2^20 fixed point (the engine convention), so
    * the order statistic is an EXACT cumulative-count crossing over
    * the distinct-residual table (the [[graft.ops.Drift.yuenTrimmed]]
    * boundary machinery: distributed range-partitioned cumulative, one
    * crossing row collected) and test coverage is an exact long
    * comparison. Output ONE row: (n_cal, rank, q, n_test, n_covered,
    * coverage).
    *
    * Shape at scale: one map-side-combined count aggregate over the
    * calibration slice (distinct-residual cardinality), the crossing
    * filter, then one conditional count over the test slice with q as
    * a plan literal. Nothing row-cardinality leaves the executors.
    */
  def conformal(cal: DataFrame, test: DataFrame, yCol: String,
      yhatCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val spark = cal.sparkSession
    val fp = 1048576d
    def res(df: DataFrame) = df
      .where(col(yCol).isNotNull && col(yhatCol).isNotNull)
      .select(abs(round(col(yCol).cast("double") * fp).cast("long")
        - round(col(yhatCol).cast("double") * fp).cast("long"))
        .as("__r"))
    val counts = graft.util.Caches.persist(
      res(cal).groupBy("__r").agg(count(lit(1)).as("__c")))
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parts = graft.util.Caches.persist(
      counts.repartitionByRange(nPart, col("__r"))
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy("__pid").orderBy("__r")
    val local = parts.withColumn("__lc", sum("__c").over(w))
    val chunkTotals = parts.groupBy("__pid")
      .agg(sum("__c").as("t")).collect().sortBy(_.getInt(0))
    val nCal = chunkTotals.map(_.getLong(1)).sum
    require(nCal >= 1, "conformal: calibration slice is empty")
    val rank = math.min(nCal,
      math.ceil((nCal + 1).toDouble * (1.0 - alpha)).toLong)
    var run = 0L
    val offRows = chunkTotals.map { r =>
      val row = Row(r.getInt(0), run); run += r.getLong(1); row
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("__pid", IntegerType, false),
        StructField("__off", LongType, false))))
    val hit = local.join(broadcast(offDf), "__pid")
      .select(col("__r"), col("__c"),
        (col("__lc") + col("__off")).as("__cum"))
      .where(col("__cum") >= rank && col("__cum") - col("__c") < rank)
      .collect()
    require(hit.length == 1,
      s"conformal: expected one crossing row, got ${hit.length}")
    val qFp = hit.head.getLong(0)
    val cov = res(test)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= qFp, 1L).otherwise(0L)).as("n_covered"))
      .collect().head
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    // n_test = 0: the out-of-sample audit NEVER RAN — coverage is NULL
    // (round-18 ADVICE: reporting 1.0 read as a perfect audit when no
    // audit happened; an empty slice must be distinguishable from a
    // perfectly covered one). The sum over an empty slice is SQL NULL,
    // so n_covered is read defensively too.
    val nTest = cov.getLong(0)
    val nCov = if (cov.isNullAt(1)) 0L else cov.getLong(1)
    spark.createDataFrame(
      Seq(Row(nCal, rank, r6(qFp.toDouble / fp), nTest, nCov,
        if (nTest > 0) Double.box(r6(nCov.toDouble / nTest.toDouble))
        else null)).asJava,
      StructType(Seq(
        StructField("n_cal", LongType, false),
        StructField("rank", LongType, false),
        StructField("q", org.apache.spark.sql.types.DoubleType, false),
        StructField("n_test", LongType, false),
        StructField("n_covered", LongType, false),
        StructField("coverage",
          org.apache.spark.sql.types.DoubleType, true))))
  }
}

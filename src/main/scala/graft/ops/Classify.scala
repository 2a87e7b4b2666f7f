package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Statistical language-model quality scoring (SURVEY §2.3 extension
  * surface — the perplexity-style filter of the CCNet/CC-100 pipeline
  * recipe: score every document against an n-gram LM and filter or
  * stratify on the score).
  *
  * The model here is a word-bigram LM with add-k smoothing, trained on
  * the corpus itself (optionally per group, e.g. per language — the
  * CCNet setup trains one LM per language). The score is the document's
  * cross-entropy under that model in nats/bigram: low = the document
  * looks like the corpus, high = boilerplate/noise/outlier. Two corpus
  * scans, both shuffle-bounded:
  *
  *  1. model build — bigram counts keyed by (group, w1, w2), a map-side
  *     combined aggregation whose output is vocabulary²-bounded, never
  *     corpus-sized; head counts reduce from it, vocabulary sizes are a
  *     per-group scalar.
  *  2. scoring — the per-doc bigram table joins the model on its natural
  *     key (group, w1, w2) and reduces per doc with map-side combine.
  *
  * DETERMINISM CONTRACT (the oracle replays this exactly): smoothed
  * probability p = (c12 + alpha) / (c1 + alpha·V) computed in IEEE
  * double; per-bigram log contribution fixed to integer micro-nats via
  * round(ln(p)·1e6) — the summation is then LONG arithmetic, so the
  * per-doc reduce is order-insensitive and bit-identical in any engine;
  * final score = round(-sum/1e6/nBigrams, 6). Docs with fewer than two
  * words have no bigrams and are not scored.
  *
  * (ref: the reference delegates all transformation to its SQL view
  * contract, CassandraExtract.scala:40-78; this operator is north-star
  * extension surface, SURVEY §2.3.)
  */
object LanguageModel {

  /** Per-document cross-entropy (nats/bigram) under the corpus's own
    * add-`alpha`-smoothed word-bigram model, trained per `groupCols`
    * (empty = one global model). Output: (doc_id, n_bigrams, xent).
    */
  def bigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String] = Nil, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val gcols = groupCols.map(col)

    // ws MATERIALIZED in its own projection: transform() is interpreted
    // and re-evaluates an inlined split per lambda call (the wordShingles
    // O(words²) trap, TextFunctions.scala:49)
    val ws = df.select(col(idCol).as("doc_id") +: T.words(col(textCol))
      .as("__ws") +: gcols: _*)
    // sequence(1,0) in Spark steps BACKWARDS ([1,0]), so short docs must
    // be nulled out before explode (explode drops null arrays) — DuckDB's
    // generate_series(1,0) is empty, which this matches
    val grams = when(size(col("__ws")) >= 2,
      transform(sequence(lit(1), size(col("__ws")) - 1),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2"))))
    val bg = graft.util.Caches.persist(
      ws.select(col("doc_id") +: explode(grams).as("__bg") +: gcols: _*)
        .select(Seq(col("doc_id"), col("__bg.w1").as("w1"),
          col("__bg.w2").as("w2")) ++ gcols: _*)
        .groupBy(col("doc_id") +: col("w1") +: col("w2") +: gcols: _*)
        .agg(count(lit(1)).as("cnt")))

    val c12 = bg.groupBy(gcols ++ Seq(col("w1"), col("w2")): _*)
      .agg(sum("cnt").as("c12"))
    val c1 = c12.groupBy(gcols :+ col("w1"): _*).agg(sum("c12").as("c1"))
    // vocabulary = distinct words in any bigram position (per group) — a
    // per-group scalar, broadcast to the model rows
    val vocab = bg.select(gcols :+ col("w1").as("__w"): _*)
      .union(bg.select(gcols :+ col("w2").as("__w"): _*))
      .groupBy(gcols: _*).agg(countDistinct("__w").as("__v"))

    val model = c12.join(c1, groupCols :+ "w1")
    val withV =
      if (groupCols.isEmpty) model.crossJoin(broadcast(vocab))
      else model.join(broadcast(vocab), groupCols)
    val lp = withV.select(gcols ++ Seq(col("w1"), col("w2"),
      round(log((col("c12").cast("double") + lit(alpha))
        / (col("c1").cast("double") + lit(alpha) * col("__v").cast("double")))
        * 1e6, 0).cast("long").as("__lp6")): _*)

    bg.join(lp, groupCols ++ Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_bigrams"),
        sum(col("cnt") * col("__lp6")).as("__s6"))
      .select(col("doc_id"), col("n_bigrams"),
        (round(-col("__s6").cast("double") / 1e6 / col("n_bigrams"), 6)
          + lit(0d)).as("xent"))
  }

  /** Per-document cross-entropy (nats/trigram) under an interpolated
    * Kneser-Ney TRIGRAM model trained on the corpus itself (round 18)
    * — the n >= 3 smoothing real curation pipelines run (public
    * knowledge: Kneser & Ney 1995; Chen & Goodman 1999's interpolated
    * formulation with one fixed discount D):
    *
    *   p(w3|w1w2) = max(c123-D,0)/c12 + D·N1+(w1w2·)/c12 · p(w3|w2)
    *   p(w3|w2)   = max(N1+(·w2w3)-D,0)/N1+(·w2·)
    *                + D·N1+(w2·)/N1+(·w2·) · p_cont(w3)
    *   p_cont(w3) = N1+(·w3) / N1+(··)
    *
    * where the lower orders use CONTINUATION counts (distinct-context
    * type counts), the KN insight that makes "Francisco" rare as a
    * continuation even though frequent as a token. Every count table
    * reduces from the trigram TYPE table, so the whole model is
    * trigram-type-bounded — never corpus-sized (at 100 TB, train per
    * group/language; each model's shuffle is its type table, map-side
    * combined).
    *
    * Scoring joins each doc's trigrams to the model on the natural key;
    * because the model is trained on the same corpus, every doc trigram
    * is an observed type and the join is total. DETERMINISM CONTRACT
    * (the oracle replays this): all counts exact longs; p evaluated in
    * IEEE double with the EXACT parenthesization written below; the
    * per-trigram log contribution snapped to integer micro-nats
    * (round(ln(p)·1e6) as long), so the per-doc reduce is
    * order-insensitive; xent = round(-sum/1e6/n_trigrams, 6). Docs
    * with fewer than three words are not scored. `discount` must be in
    * (0, 1] — KN's mass-conservation bound.
    *
    * Output: (doc_id, n_trigrams, xent).
    */
  def knTrigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String] = Nil, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount <= 1,
      s"discount must be in (0, 1], got $discount")
    val gcols = groupCols.map(col)
    val d = lit(discount)

    val ws = df.select(col(idCol).as("doc_id") +: T.words(col(textCol))
      .as("__ws") +: gcols: _*)
    // same short-doc null-out convention as the bigram model (sequence
    // steps backwards on len < 3; explode drops the nulled array)
    val grams = when(size(col("__ws")) >= 3,
      transform(sequence(lit(1), size(col("__ws")) - 2),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2"),
          element_at(col("__ws"), i + 2).as("w3"))))
    val tg = graft.util.Caches.persist(
      ws.select(col("doc_id") +: explode(grams).as("__tg") +: gcols: _*)
        .select(Seq(col("doc_id"), col("__tg.w1").as("w1"),
          col("__tg.w2").as("w2"), col("__tg.w3").as("w3")) ++ gcols: _*)
        .groupBy(col("doc_id") +: col("w1") +: col("w2") +: col("w3")
          +: gcols: _*)
        .agg(count(lit(1)).as("cnt")))

    // the trigram TYPE table — every other count reduces from it
    val t3 = graft.util.Caches.persist(
      tg.groupBy(gcols ++ Seq(col("w1"), col("w2"), col("w3")): _*)
        .agg(sum("cnt").as("c123")))
    // trigram context: raw total + distinct-continuation type count
    val ctx12 = t3.groupBy(gcols ++ Seq(col("w1"), col("w2")): _*)
      .agg(sum("c123").as("c12"), count(lit(1)).as("n12"))
    // bigram-level continuation-count tables (distinct w1 per (w2,w3))
    val t23 = graft.util.Caches.persist(
      t3.groupBy(gcols ++ Seq(col("w2"), col("w3")): _*)
        .agg(count(lit(1)).as("n_dot23")))
    val ctx2 = t23.groupBy(gcols :+ col("w2"): _*)
      .agg(sum("n_dot23").as("nmid2"), count(lit(1)).as("n2dot"))
    val cont3 = t23.groupBy(gcols :+ col("w3"): _*)
      .agg(count(lit(1)).as("n_dot3"))
    val tot =
      if (groupCols.isEmpty)
        t23.agg(count(lit(1)).as("ntot"))
      else t23.groupBy(gcols: _*).agg(count(lit(1)).as("ntot"))

    val joined = t3
      .join(ctx12, groupCols ++ Seq("w1", "w2"))
      .join(t23, groupCols ++ Seq("w2", "w3"))
      .join(ctx2, groupCols :+ "w2")
      .join(cont3, groupCols :+ "w3")
    val withTot =
      if (groupCols.isEmpty) joined.crossJoin(broadcast(tot))
      else joined.join(broadcast(tot), groupCols)

    // PINNED parenthesization — the oracle writes this expression
    // verbatim; micro-nat snap absorbs the residual libm-ln ulps
    def dbl(c: String) = col(c).cast("double")
    val pcont = dbl("n_dot3") / dbl("ntot")
    val pbi = greatest(dbl("n_dot23") - d, lit(0d)) / dbl("nmid2") +
      (d * dbl("n2dot")) / dbl("nmid2") * pcont
    val p = greatest(dbl("c123") - d, lit(0d)) / dbl("c12") +
      (d * dbl("n12")) / dbl("c12") * pbi
    val lp = withTot.select(gcols ++ Seq(col("w1"), col("w2"), col("w3"),
      round(log(p) * 1e6, 0).cast("long").as("__lp6")): _*)

    tg.join(lp, groupCols ++ Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_trigrams"),
        sum(col("cnt") * col("__lp6")).as("__s6"))
      .select(col("doc_id"), col("n_trigrams"),
        (round(-col("__s6").cast("double") / 1e6 / col("n_trigrams"), 6)
          + lit(0d)).as("xent"))
  }
}

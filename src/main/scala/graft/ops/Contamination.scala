package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Train/test contamination check (SURVEY §2.3 extension surface): how
  * much of an evaluation set already leaks into the training corpus.
  *
  * For each eval document, the fraction of its distinct hashed
  * word-n-gram shingles that appear in ANY other corpus document —
  * the standard n-gram-overlap contamination metric LLM data pipelines
  * run before training (cf. the GPT-3/PaLM appendix methodology).
  *
  * 100 TB shape: the corpus side is one narrow projection + explode —
  * it NEVER shuffles. The eval side is small by contract (an eval suite,
  * not a second corpus) and is broadcast, so the match is a map-side
  * hash join on the shingle hash. The only shuffle is the distinct on
  * matched (eval_id, shingle) pairs, and partial aggregation caps each
  * map partition's contribution at the eval shingle-set size — a common
  * trigram matching millions of corpus docs collapses to one row per
  * partition before the exchange.
  */
object Contamination {

  /** (eval_id, n_shingles, n_contaminated, contamination ∈ [0,1]) per
    * eval doc; an eval doc also present in `corpus` does not match
    * itself (same id), so self-overlap never counts as contamination.
    */
  def check(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3,
      broadcastEval: Boolean = true): DataFrame = {
    val evalSh = evalSet.select(col(idCol).as("eval_id"),
      T.hashedWordNgrams(col(textCol), shingleN).as("shingles"))
    val evalExpl = evalSh.select(col("eval_id"), explode(col("shingles")).as("h"))
    val evalSide = if (broadcastEval) broadcast(evalExpl) else evalExpl
    val corpusExpl = corpus.select(col(idCol).as("c_id"),
      explode(T.hashedWordNgrams(col(textCol), shingleN)).as("h"))
    val matched = corpusExpl.join(evalSide, "h")
      .where(col("c_id") =!= col("eval_id"))
      .select("eval_id", "h").distinct()
      .groupBy("eval_id").agg(count(lit(1)).as("__nc"))
    evalSh
      .select(col("eval_id"), size(col("shingles")).cast("long").as("n_shingles"))
      .join(matched, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_shingles"),
        coalesce(col("__nc"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("__nc"), lit(0L)).cast("double")
          / col("n_shingles"), 6).as("contamination"))
  }

  /** Per-document NOVELTY against a reference corpus — the inverse
    * direction of [[check]]: the fraction of a document's distinct
    * hashed word-n-gram shingles that appear NOWHERE in `reference`.
    * The freshness/memorization-risk signal of corpus curation (cf. the
    * novel-n-gram methodology of memorization analyses): low novelty =
    * the document restates reference content; high = genuinely new text
    * — the mirror question to contamination's "did eval leak into
    * train".
    *
    * Output: (doc_id, n_shingles, n_novel, novelty ∈ [0,1]).
    *
    * 100 TB shape: both sides collapse to hashed-gram tables before any
    * join — the reference ships DISTINCT gram hashes only (map-side-
    * combined), never text, and the anti join keys on the gram hash. A
    * reference whose distinct-gram table is itself too large to join
    * swaps the anti join for the bloom bitmap machinery
    * ([[Joins]] bloom semi join) at the price of a bounded
    * false-already-seen rate.
    */
  def novelty(df: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3): DataFrame = {
    // persisted: the scored side is the BIG side here (unlike check(),
    // where the re-shingled side is a small eval suite) and feeds both
    // the gram explode and the n_shingles projection — without the
    // persist the md5 shingling of every document runs twice
    val docSh = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"),
        T.hashedWordNgrams(col(textCol), shingleN).as("shingles")))
    // hashedWordNgrams returns each doc's DISTINCT gram set, so the
    // explode is already (doc, gram)-unique — no distinct needed
    val docGrams = docSh.select(col("doc_id"), explode(col("shingles")).as("h"))
    val refGrams = reference
      .select(explode(T.hashedWordNgrams(col(textCol), shingleN)).as("h"))
      .distinct()
    val novel = docGrams.join(refGrams, Seq("h"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("__nn"))
    docSh
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"),
        round(coalesce(col("__nn"), lit(0L)).cast("double")
          / col("n_shingles"), 6).as("novelty"))
  }

  /** [[novelty]] with a BLOOM PRE-FILTER on the corpus side — the
    * oversized-reference path (SURVEY §2.3 row 114's noted variant),
    * EXACT by construction: the reference's distinct gram hashes fold
    * into a driver-held bloom bitmap (bounded at `mBits`, the broadcast
    * footprint class), every corpus gram probes it as a codegen'd
    * expression, and
    *
    *  - a gram the bloom REJECTS is definitely novel (no false
    *    negatives) — it never enters any join;
    *  - only the possibly-seen slice verifies against the reference
    *    gram table (an anti join whose LEFT side shrank from all corpus
    *    grams to the seen-ish fraction + the FP rate).
    *
    * Same output as [[novelty]], bit-for-bit (the bloom prunes JOIN
    * INPUT, never the answer — the [[Joins]] bloomSemi convention), so
    * the oracle replays the plain anti-join form. The win at 100 TB: a
    * high-novelty corpus (the usual case for fresh crawl vs yesterday's
    * index) sends only its small seen-ish slice through the shuffle
    * instead of every gram.
    */
  def noveltyBloom(df: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, mBits: Int = 1 << 20,
      k: Int = 5): DataFrame = {
    import graft.functions.Sketches
    val docSh = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"),
        T.hashedWordNgrams(col(textCol), shingleN).as("shingles")))
    val docGrams = docSh.select(col("doc_id"), explode(col("shingles")).as("h"))
    val refGrams = graft.util.Caches.persist(
      reference
        .select(explode(T.hashedWordNgrams(col(textCol), shingleN)).as("h"))
        .distinct())
    val bits = Sketches.bloomBitmap(refGrams, col("h"), mBits, k)
    val might = Sketches.bloomMightContain(col("h"), bits, k)
    // explicit re-select: the USING anti join surfaces the key column
    // FIRST, and a positional unionAll would pair doc_id against h
    val novel = docGrams.where(!might).select("doc_id", "h")
      .unionAll(docGrams.where(might).join(refGrams, Seq("h"), "left_anti")
        .select("doc_id", "h"))
      .groupBy("doc_id").agg(count(lit(1)).as("__nn"))
    docSh
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"),
        round(coalesce(col("__nn"), lit(0L)).cast("double")
          / col("n_shingles"), 6).as("novelty"))
  }
}

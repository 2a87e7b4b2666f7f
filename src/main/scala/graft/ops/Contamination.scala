package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** [[noveltyBloom]] with the bloom held IN THE PLAN instead of on the
    * driver — the genuinely-oversized-reference path. [[noveltyBloom]]'s
    * bitmap is an `Array[Long]` collected to the driver: config-bounded,
    * but a 100-TB reference corpus wants m in the 10¹¹-bit range (≈12 GB)
    * to keep the false-positive rate useful, which no driver should hold.
    * Here the reference grams fold into a WORD-PARTITIONED bloom table
    * `(w, bits)` — one row per non-zero 64-bit word, fully distributed,
    * the same representation [[Layout.bloomAugment]] persists per block —
    * and corpus grams probe it with a word-key JOIN: each gram ships its
    * k probe positions, a gram is possibly-seen iff ALL k probed words
    * have the bit set (a missing word row is bits=0 — definite miss).
    *
    * EXACT like [[noveltyBloom]]: bloom verdicts only ROUTE grams —
    * definite misses (no false negatives) count novel without any join;
    * the possibly-seen slice verifies against the reference gram table.
    * Same output as [[novelty]], bit-for-bit; the oracle replays the
    * plain anti-join form.
    *
    * 100 TB shuffle ledger vs the plain anti join (which shuffles
    * corpus_grams + ref_grams on the gram hash): this path shuffles
    * k·corpus_grams probe rows + m/64 bloom words on `w`, then the
    * surviving slice + ref_grams. With ref_grams >> k·corpus_grams — the
    * fresh-crawl-vs-yesterday's-index case this variant exists for — the
    * reference side is paid ONCE into a reusable m/64-row table instead
    * of on every scoring run, and a high-novelty corpus sends only its
    * seen-ish slice through the expensive gram-keyed shuffle.
    */
  def noveltyBloomBig(df: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, mBits: Long = 1L << 27,
      k: Int = 5): DataFrame = {
    require(mBits >= 64, s"mBits must be >= 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val m = ((mBits + 63) / 64) * 64
    val docSh = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"),
        T.hashedWordNgrams(col(textCol), shingleN).as("shingles")))
    val docGrams = docSh.select(col("doc_id"), explode(col("shingles")).as("h"))
    val refGrams = graft.util.Caches.persist(
      reference
        .select(explode(T.hashedWordNgrams(col(textCol), shingleN)).as("h"))
        .distinct())
    def probes(c: Column): Column = explode(array((0 until k).map(i =>
      pmod(xxhash64(c.cast("string"), lit(i)), lit(m))): _*))
    // distributed build: one map-side-combined bit_or per word
    val refBloom = refGrams
      .select(probes(col("h")).as("__h"))
      .select(expr("__h div 64").as("__w"),
        expr("shiftleft(1L, cast(__h % 64 AS INT))").as("__m"))
      .groupBy("__w").agg(expr("bit_or(__m)").as("__bits"))
    // probe: k word-keyed lookups per gram; ALL k must hit
    val verdicts = docGrams
      .select(col("doc_id"), col("h"), probes(col("h")).as("__h"))
      .select(col("doc_id"), col("h"), expr("__h div 64").as("__w"),
        expr("shiftleft(1L, cast(__h % 64 AS INT))").as("__m"))
      .join(refBloom, Seq("__w"), "left")
      .groupBy("doc_id", "h")
      .agg(sum(when(coalesce(col("__bits"), lit(0L))
        .bitwiseAND(col("__m")) =!= 0L, 1L).otherwise(0L)).as("__hits"))
    val novel = verdicts.where(col("__hits") < k).select("doc_id", "h")
      .unionAll(verdicts.where(col("__hits") === k).select("doc_id", "h")
        .join(refGrams, Seq("h"), "left_anti")
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

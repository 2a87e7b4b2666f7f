package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Corpus retrieval operators: inverted-index construction and BM25
  * ranked search (SURVEY §2.3 north-star family — full-text retrieval is
  * the query side of a training-data curation stack: "find every document
  * about X" over the whole corpus).
  *
  * Scale shape: the postings build is one explode + map-side-combined
  * count (the shuffle carries one (term, doc) partial per partition, not
  * token occurrences). BM25 search filters the exploded terms to the
  * query's term set BEFORE the shuffle, so only matching postings move;
  * the per-term document frequencies and the corpus-wide length stats are
  * tiny aggregates broadcast back onto the candidates, and the final
  * top-k is a TakeOrderedAndProject (per-partition heads merged on the
  * driver), never a global sort.
  *
  * Determinism contract (DuckDB oracle): per-(doc, term) BM25 weights are
  * computed by one fixed IEEE expression shape and snapped to 6dp
  * fixed-point longs; the per-document score is a SUM of those longs —
  * exact and order-insensitive — so both engines rank identical values.
  */
object Retrieval {

  /** Fixed-point scale for BM25 weights: 6 decimal digits. */
  private val Fp = 1000000L

  /** Postings table (term, doc_id, tf): the inverted index body.
    * One narrow explode + one count shuffle keyed (term, doc).
    */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(T.words(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Inverted-index dictionary: per term its document frequency `df`,
    * collection frequency `cf`, and smoothed idf (6dp). `minDf` prunes
    * the hapax tail that dominates vocabulary size at corpus scale.
    * Built from [[postings]] with one more map-side-combined aggregate;
    * n_docs is a scalar broadcast onto the dictionary rows.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    postings(df, idCol, textCol)
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .where(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"), col("cf"),
        round(log(lit(1d) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))), 6).as("idf"))
  }

  /** BM25 ranked retrieval: top-`k` documents for a bag of query terms.
    *
    * Per matching (doc, term): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    * weight = idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)), snapped
    * to a 6dp fixed-point long. Per doc: score_fp = Σ weight_fp (exact
    * long sum), ties broken by doc_id. Output:
    * (rnk, doc_id, n_hit, score_fp, score).
    *
    * Plan: candidates = postings of the query terms only (the `isin`
    * filter runs before the tf shuffle); df-per-term and the (N, avgdl)
    * stats are broadcast; top-k is TakeOrderedAndProject over score_fp,
    * then row_number runs on just k rows.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.distinct
    // corpus stats: N and avgdl (exact long sum of doc lengths / N)
    val ws = T.words(col(textCol))
    val stats = df.select(size(ws).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    // candidate postings: only the query terms survive to the shuffle
    val tf = df
      .select(col(idCol).as("doc_id"), size(ws).cast("long").as("dl"),
        explode(ws).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf: Column = log(lit(1d) + (col("n_docs") - col("df") + lit(0.5))
      / (col("df") + lit(0.5)))
    val norm: Column = col("tf") + lit(k1) * (lit(1d) - lit(b)
      + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val w: Column = idf * ((col("tf") * lit(k1 + 1d)) / norm)
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(w * Fp).cast("long").as("w_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"), sum("w_fp").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn("rnk", row_number().over(Window
        .orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_hit"), col("score_fp"),
        (col("score_fp").cast("double") / Fp).as("score"))
  }

  /** Query-likelihood retrieval with DIRICHLET smoothing (Zhai &
    * Lafferty 2001) — the language-modeling ranker next to [[bm25TopK]]
    * (the two disagree usefully: QLD's length normalization is
    * principled rather than tuned, and its smoothing rewards docs in
    * proportion to corpus-wide term rarity):
    * score(d, Q) = Σ_{q∈Q} ln((tf_dq + μ·cf_q/|C|) / (dl_d + μ)).
    * EVERY query term contributes to every candidate document —
    * a missing term adds the background mass ln(μ·p_q/(dl+μ)), which is
    * what makes long digressive docs lose to focused ones. Query terms
    * absent from the corpus entirely (cf = 0) are dropped: they would
    * add the same −∞-leaning constant to every document and change no
    * ranking, only poison the arithmetic.
    *
    * Determinism: per-(doc, term) weights snap to ×2^20 fixed-point
    * longs (one ln each, the [[bm25TopK]] convention), summed exactly;
    * ties break by doc_id. Output (rnk, doc_id, n_terms, score_fp,
    * score).
    *
    * Shape at scale: the tf shuffle carries only the query terms'
    * postings (isin pushes before the aggregate); the doc × query-term
    * grid is |docs|·|Q| narrow rows from one broadcast of the tiny
    * (term, cf) table; top-k is TakeOrderedAndProject.
    */
  def qldTopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      mu: Double = 2000.0): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1 && mu > 0, s"need k >= 1 and mu > 0, got $k, $mu")
    val terms = queryTerms.distinct
    val ws = T.words(col(textCol))
    val base = df.select(col(idCol).as("doc_id"),
      size(ws).cast("long").as("dl"))
    val tot = base.agg(sum("dl").as("c_tokens"))
    val tfq = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"), explode(ws).as("term"))
        .where(col("term").isInCollection(terms))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val cf = tfq.groupBy("term").agg(sum("tf").as("cf"))
    val w = log((coalesce(col("tf"), lit(0L)).cast("double")
        + lit(mu) * (col("cf").cast("double")
          / col("c_tokens").cast("double")))
      / (col("dl").cast("double") + lit(mu)))
    val scored = base.crossJoin(broadcast(cf))
      .join(tfq, Seq("doc_id", "term"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), round(w * Fp).cast("long").as("w_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("w_fp").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn("rnk", row_number().over(Window
        .orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_terms"), col("score_fp"),
        (col("score_fp").cast("double") / Fp).as("score"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001; Abdul-Jaleel
    * et al. 2004) — the standard query-expansion loop over [[qldTopK]]:
    * retrieve once, treat the top `fbDocs` documents as a relevance
    * sample, estimate an expansion language model from them, and
    * re-retrieve with the interpolated query. The curation read: "find
    * documents about X" where the user's two query words undersell the
    * topic's actual vocabulary — the feedback docs supply the missing
    * terms, no external thesaurus or embedding needed.
    *
    * Deterministic pinned form (every stage exact-integer or
    * 6dp-snapped, replayable in DuckDB):
    *
    *  1. feedback set F = [[qldTopK]](queryTerms, k = fbDocs) ids.
    *  2. relevance-model mass per candidate term (original query terms
    *     and the empty token excluded): rm(w) = Σ_{d∈F} (tf_wd · Fp)
    *     div dl_d — the UNIFORM-document-weight relevance model (the
    *     exp(score) doc weighting of full RM1 is a cross-engine
    *     transcendental; uniform top-k weighting is the published
    *     simplification that stays exact). Top `fbTerms` by
    *     (mass desc, term asc) expand the query.
    *  3. interpolated weights: original terms get Fp·(αden−αnum) div
    *     αden each; expansion term w gets (αnum·Fp·rm(w)) div
    *     (αden·Σrm) — exact longs, α defaulting to 1/2. If no
    *     expansion candidate exists the query degenerates loudly-
    *     documented to the weighted original.
    *  4. re-score: the [[qldTopK]] per-(doc, term) 6dp weight w_fp,
    *     summed as Σ_t weight(t) · w_fp(t, d) — score_fp at Fp² scale.
    *
    * Output: (rnk, doc_id, n_terms, score_fp, score = score_fp/Fp²).
    * Two driver round-trips, both bounded by CONFIG not data: the
    * fbDocs feedback ids and the fbTerms expansion terms (they become
    * plan literals for the final pass). Shape at scale: two [[qldTopK]]
    * passes plus one tf aggregate over fbDocs documents — the second
    * pass's postings filter carries ≤ |Q| + fbTerms terms.
    */
  def rm3TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10, fbDocs: Int = 5,
      fbTerms: Int = 10, mu: Double = 2000.0,
      alphaNum: Long = 1, alphaDen: Long = 2): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(fbDocs >= 1 && fbDocs <= 1000 && fbTerms >= 1 && fbTerms <= 1000,
      s"fbDocs/fbTerms must be in [1, 1000], got $fbDocs/$fbTerms")
    require(alphaNum >= 0 && alphaDen > alphaNum,
      s"need 0 <= alphaNum < alphaDen, got $alphaNum/$alphaDen")
    val orig = queryTerms.distinct
    // stage 1: feedback ids — a fbDocs-bounded driver round-trip
    val fbIds = qldTopK(df, idCol, textCol, orig, fbDocs, mu)
      .select("doc_id").collect().map(_.get(0)).toSeq
    // stage 2: uniform-weight relevance-model mass, exact fixed point
    val ws = T.words(col(textCol))
    val mass = df.where(col(idCol).isInCollection(fbIds))
      .select(col(idCol).as("doc_id"), size(ws).cast("long").as("dl"),
        explode(ws).as("term"))
      .where(!col("term").isInCollection(orig) && col("term") =!= "")
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(sum(expr(s"(tf * ${Fp}L) div dl")).as("rm_fp"))
      .orderBy(col("rm_fp").desc, col("term")).limit(fbTerms)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val rmTot = mass.map(_._2).sum
    val origW = Fp * (alphaDen - alphaNum) / alphaDen
    val weights: Seq[(String, Long)] =
      orig.map(t => t -> origW) ++
        (if (rmTot > 0)
          mass.map { case (t, m) =>
            t -> alphaNum * Fp * m / (alphaDen * rmTot) }
        else Seq.empty)
    // stage 3: weighted QLD over the interpolated term set
    val spark = df.sparkSession
    import spark.implicits._
    val wt = broadcast(weights.toDF("term", "q_w"))
    val terms = weights.map(_._1)
    val base = df.select(col(idCol).as("doc_id"),
      size(ws).cast("long").as("dl"))
    val tot = base.agg(sum("dl").as("c_tokens"))
    val tfq = graft.util.Caches.persist(
      df.select(col(idCol).as("doc_id"), explode(ws).as("term"))
        .where(col("term").isInCollection(terms))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val cf = tfq.groupBy("term").agg(sum("tf").as("cf"))
    val w = log((coalesce(col("tf"), lit(0L)).cast("double")
        + lit(mu) * (col("cf").cast("double")
          / col("c_tokens").cast("double")))
      / (col("dl").cast("double") + lit(mu)))
    val scored = base.crossJoin(broadcast(cf))
      .join(wt, Seq("term"))
      .join(tfq, Seq("doc_id", "term"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (col("q_w") * round(w * Fp).cast("long")).as("w_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("w_fp").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn("rnk", row_number().over(Window
        .orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_terms"), col("score_fp"),
        (col("score_fp").cast("double") / Fp / Fp).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    * the standard hybrid-retrieval combiner: a lexical ranking
    * ([[bm25TopK]]) and a semantic one
    * ([[graft.ops.Similarity.bruteTopK]]/annTopK) vote through their
    * RANKS, so neither scoring scale has to be calibrated against the
    * other. Each input needs (doc_id, rnk); a document's fused score is
    * Σ_lists floor(1e6 / (rrfK + rnk)) — fixed-point long from the
    * start (floor, not round: both engines take the identical path and
    * no half-way tie exists to disagree on), summed exactly in any
    * order. Output: (rnk, doc_id, n_lists, score_fp, score).
    *
    * Shape at scale: the lists are already tiny (top-k each), so the
    * union + one aggregate + TakeOrderedAndProject is driver-negligible
    * regardless of corpus size — all the heavy lifting stays in the
    * upstream retrievers.
    */
  /** Fixed-point scale for NDCG discounts: 12 decimal digits. */
  val DiscFp = 1000000000000L

  /** NDCG rank discounts 1/log2(i+1), i = 1..k, as `DiscFp` fixed-point
    * longs. Computed ONCE here in Scala and inlined as literals into
    * both the Spark plan and the oracle SQL — neither engine evaluates a
    * log, so there is no cross-engine transcendental to disagree on.
    */
  def ndcgDiscountsFp(k: Int): IndexedSeq[Long] =
    (1 to k).map(i => math.round(DiscFp / (math.log(i + 1d) / math.log(2d))))

  /** Cumulative sums of [[ndcgDiscountsFp]]: ideal-DCG for n = 1..k
    * relevant documents (exact long arithmetic).
    */
  def ndcgCumFp(k: Int): IndexedSeq[Long] =
    ndcgDiscountsFp(k).scanLeft(0L)(_ + _).tail

  /** Ranking-quality evaluation at cutoff `k` — the offline-eval loop
    * every retrieval stack needs: given a run (query_id, doc_id, rnk;
    * rnk 1-based within each query) and binary-relevance qrels
    * (query_id, doc_id), emit per query:
    * (n_rel, n_rel_at_k, precision_at_k, recall_at_k, rr, ndcg_at_k).
    *
    * Determinism: DCG is a SUM of fixed-point discount literals
    * ([[ndcgDiscountsFp]]) — exact, order-free; ideal DCG is a literal
    * lookup ([[ndcgCumFp]]) at min(n_rel, k); every surfaced ratio is a
    * single exact-integer double division. Queries with no relevant
    * retrieved document appear with zeros (never silently dropped).
    *
    * Shape at scale: one keyed join run⨝qrels on (query, doc), two
    * map-side-combined per-query aggregates, one join keyed on the
    * query id. Runs are top-k-bounded upstream, so volume is
    * queries × k, never corpus-sized.
    */
  def rankEval(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val dArr = array(ndcgDiscountsFp(k).map(lit): _*)
    val cArr = array(ndcgCumFp(k).map(lit): _*)
    val rels = qrels.select(col("query_id"), col("doc_id")).distinct()
    val nrel = rels.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = run.where(col("rnk") <= k)
      .join(rels, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("__hit"), min("rnk").as("__frr"),
        sum(element_at(dArr, col("rnk").cast("int"))).as("__dcg_fp"))
    nrel.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("__hit"), lit(0L)).as("n_rel_at_k"),
        (coalesce(col("__hit"), lit(0L)).cast("double") / k)
          .as("precision_at_k"),
        (coalesce(col("__hit"), lit(0L)).cast("double") / col("n_rel"))
          .as("recall_at_k"),
        coalesce(lit(1.0) / col("__frr"), lit(0.0)).as("rr"),
        (coalesce(col("__dcg_fp"), lit(0L)).cast("double")
          / element_at(cArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
          .as("ndcg_at_k"))
  }

  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    val scored = rankings
      .map(r => r.select(col("doc_id"),
        floor(lit(Fp.toDouble)
          / (lit(rrfK.toDouble) + col("rnk").cast("double")))
          .cast("long").as("c_fp")))
      .reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lists"), sum("c_fp").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id")).limit(k)
    scored
      .withColumn("rnk", row_number().over(Window
        .orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_lists"), col("score_fp"),
        (col("score_fp").cast("double") / Fp).as("score"))
  }
}

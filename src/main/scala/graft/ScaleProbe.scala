package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev-only scale-extrapolation probe: multiply the corpus Nx (ids
  * shifted, so duplicates ARE introduced across copies) and time the
  * candidate-bounded operators. The point is the growth CURVE: signature
  * passes should scale ~linearly; the self-joins grow with real duplicate
  * density (here every doc gains N-1 exact twins — a worst-ish case for
  * bucket sizes).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.drop(1).map(_.toInt) match {
      case Array() => Array(1, 2, 4)
      case m       => m
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count() // warm

    def amplify(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
        .reduce(_ unionAll _)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    for (m <- mults) {
      val d = amplify(docs, "doc_id", m)
      val e = amplify(embs, "vec_id", m)
      // SPARK_GRAFT_SCALE_ONLY=a,b,c restricts to named probes (local
      // iteration aid, same contract as Bench's BENCH_ONLY)
      val only: String => Boolean =
        sys.env.get("SPARK_GRAFT_SCALE_ONLY")
          .map(_.split(",").map(_.trim).toSet)
          .map(s => s.contains(_: String)).getOrElse(_ => true)
      def t(name: String)(body: => Long): Unit = if (only(name)) {
        val t0 = System.nanoTime()
        val rows = body
        println(f"[scale] x$m $name rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      t("minhash_pairs") {
        Dedup.minhashPairs(d, "doc_id", "text", threshold = 0.9).count()
      }
      // gate tunables (maxBlock=20, lshBands=8): every over-20-doc
      // (lang, lenb) block goes through the in-block LSH fallback, so the
      // curve measures the GUARD path, not the all-pairs fast path
      t("ngram_pairs_guarded") {
        Dedup.ngramJaccardPairs(d, "doc_id", "text", Seq("lang"),
          threshold = 0.5, maxBlock = 20).count()
      }
      // gate tunable (maxBucket=64): amplified duplicate clusters push
      // band buckets over the cap, exercising the re-banding splitter
      t("simhash_pairs_guarded") {
        Dedup.simhashPairs(d, "doc_id", "text", maxBucket = 64).count()
      }
      t("embed_neardup_guarded") {
        Similarity.nearDupPairs(e, 0.4, maxBucket = 16).count()
      }
      // fixed-size eval set vs an Nx corpus: contamination must grow with
      // the CORPUS (the narrow explode side), never with eval-squared
      t("contamination") {
        graft.ops.Contamination.check(d,
          docs.where(col("doc_id") % 50 === 0), "doc_id", "text").count()
      }
      // distributed-bloom novelty with the REFERENCE side amplified (the
      // oversized-reference case the variant exists for): fixed corpus,
      // Nx reference; cost should track the reference fold + the
      // corpus-sized probe join, never a driver bitmap
      t("novelty_bloom_big") {
        graft.ops.Contamination.noveltyBloomBig(
          docs.where(col("doc_id") % 11 === 0), d, "doc_id", "text",
          mBits = 1L << 24).count()
      }
      // pairwise exact-substring detection under Nx duplication: every
      // doc gains N-1 exact twins, so qualifying PAIRS grow ~C(N,2)·docs
      // — cost must track true pair volume (df-capped gram join), not
      // corpus²
      t("dup_substring") {
        graft.ops.TextAnalysis.dupSubstring(d, "doc_id", "text",
          n = 8).count()
      }
      // self-repetition excision is per-doc work only — flat per doc,
      // linear in corpus
      t("self_repetition_apply") {
        graft.ops.TextAnalysis.selfRepetitionApply(d, "doc_id", "text",
          n = 3).count()
      }
      // chunking is a pure narrow explode — the flat-cost reference curve
      t("text_chunk") {
        graft.ops.TextAnalysis.chunk(d, "doc_id", "text", 32, 8).count()
      }
      // keyed (doc, gram) counts: linear in exploded gram count
      t("repetition") {
        graft.ops.TextAnalysis.repetition(d, "doc_id", "text").count()
      }
      // tf agg + df rollup + term join + per-doc window: ~linear; the
      // amplified copies multiply df but not the vocabulary
      t("tfidf_topk") {
        graft.ops.TextAnalysis.tfidfTopK(d, "doc_id", "text").count()
      }
      // per-column group-then-count (the no-expand exact path)
      t("profile_exact") {
        graft.ops.Profile.table(d, Seq("doc_id", "lang", "source")).count()
      }
      // vocab stays fixed while the corpus grows: broadcast joins only
      t("encode") {
        graft.ops.Encoding.encode(d, Seq("source", "lang")).count()
      }
      // amplified events deepen each user's history; the row_number cap
      // must keep collect state at maxTurns regardless of depth
      val ev = amplify(graft.queries.Tables.events(spark, dir), "event_id", m)
      t("assemble_capped") {
        graft.ops.Assemble.threads(ev, "user_id",
          Seq(col("ts"), col("event_id")), "event_type", maxTurns = 16).count()
      }
      // amplified copies make every passage a cross-doc duplicate — the
      // worst case for the first-occurrence window (deepest partitions)
      t("dedup_passages") {
        Dedup.passages(d, "doc_id", "text", window = 8).count()
      }
      t("heavy_hitters") {
        graft.ops.TextAnalysis.heavyHitters(d, "text", 100).count()
      }
      // round 8b: register/cell sketches must stay FLAT (output size is a
      // constant of the sketch shape, shuffle is map-side combined)
      t("hll_grouped") {
        graft.functions.Sketches.hllDistinct(d, col("doc_id"),
          Seq("lang")).count()
      }
      t("cms_heavy") {
        graft.functions.Sketches.cmsHeavy(d, col("source")).count()
      }
      // one range sort; manifest rows = n/blockSize (linear, sort-bound)
      t("zorder_manifest") {
        graft.ops.Layout.zorderManifest(
          d.withColumn("x", col("doc_id") % 4096)
            .withColumn("y", col("n_chars") % 4096),
          "x", "y", "doc_id", blockSize = 4096, bits = 12).count()
      }
      // latest-wins merge: one key shuffle; the change feed is the x1
      // corpus so base:changes ratio grows with m
      t("merge_upsert") {
        graft.ops.Cdc.upsert(d,
          docs.withColumn("v", lit(1L)).withColumn("op", lit("U")),
          "doc_id", "v", "op").count()
      }
      // narrow zero-shuffle projection: the flat-cost reference curve for
      // embedding passes (scales only with input rows)
      t("embed_project") {
        Similarity.projectSigned(e, 64, 16).count()
      }
      t("outliers_mad") {
        graft.ops.Profile.outliersMad(d, "n_chars", Seq("lang")).count()
      }
      // round 9: one range sort + partition offsets — linear, sort-bound
      t("deterministic_shuffle") {
        graft.ops.Sampling.deterministicShuffle(d, "doc_id").count()
      }
      // round 9: amplification makes EVERY doc a cluster member (m-way
      // exact twins) — worst case for the winners window, which must stay
      // bounded by the duplicate slice
      t("dedup_keep_best") {
        val comps = Dedup.connectedComponents(
          Dedup.minhashPairs(d, "doc_id", "text", threshold = 0.9))
        Dedup.keepBest(d, comps, "doc_id", "n_chars").count()
      }
      // round 9: output is groups x dims regardless of corpus size — the
      // flat-output reference curve for grouped embedding passes
      t("embed_centroids") {
        Similarity.centroids(e, "label").count()
      }
      // round 9b: one hash shuffle + a sequential per-bucket pass —
      // linear; nBuckets fixed while the corpus grows, so per-stream work
      // grows m-fold (size nBuckets to the cluster in production)
      t("pack_sequences") {
        graft.ops.Sampling.packSequences(d, "doc_id", "n_chars",
          budget = 2000L, nBuckets = 64).count()
      }
      // round 9b: tiny per-stratum agg + broadcast filter — scan-bound
      t("mixture_rebalance") {
        graft.ops.Sampling.rebalance(d, "lang", "doc_id", "n_chars",
          Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)).count()
      }
      // round 9b: range sort + offsets, the deterministic_shuffle class
      t("top_fraction") {
        graft.ops.Sampling.topFraction(d, "n_chars", "doc_id", 0.25).count()
      }
      // round 9c: the Hilbert sort must track the Morton curve (same
      // one-range-sort class, only the key expression differs)
      t("hilbert_manifest") {
        graft.ops.Layout.hilbertManifest(
          d.withColumn("x", col("doc_id") % 4096)
            .withColumn("y", col("n_chars") % 4096),
          "x", "y", "doc_id", blockSize = 4096, bits = 12).count()
      }
      // round 9c: m-way exact twins put every doc in an m-sized cluster —
      // candidate growth must track duplicate pairs (C(m,2)·docs), never
      // block², and the per-query window stays candidate-bounded
      t("text_knn") {
        Dedup.knnJaccard(d, "doc_id", "text", k = 5).count()
      }
      // round 9c: same duplicate-tracking argument through the Hamming
      // bands — output IS the m-way twin pairs at hamming 0
      t("phash_pairs") {
        graft.ops.Multimodal.phashPairs(
          graft.ops.Multimodal.attach(d, "doc_id", "text", Seq("lang"))).count()
      }
      // round 9c: narrow codegen'd histogram per row — the flat-cost
      // reference curve for native text kernels
      t("char_entropy") {
        graft.ops.TextAnalysis.charEntropy(d, "doc_id", "text").count()
      }
      // round 9c: vocabulary-bounded aggregates — copies multiply counts,
      // not the vocab, so both must stay ~flat after the corpus scan
      t("bpe_pairs") {
        graft.ops.TextAnalysis.bpePairCounts(d, "text").count()
      }
      t("pmi") {
        graft.ops.TextAnalysis.pmiCollocations(d, "text").count()
      }
      // round 9c: sketch cells are a constant of (depth, width) — the
      // estimate path must be scan-bound flat
      t("cms_join_size") {
        graft.functions.Sketches.cmsJoinSize(d, col("source"),
          docs, col("source")).count()
      }
      // round 9d: PCA covariance must stay ~linear in rows (output is
      // a constant d(d+1)/2 regardless of corpus size)
      t("pca_covariance") {
        graft.ops.Pca.covariance(e, "vec_id", "embedding", dim = 64)
          .count()
      }
      // round 9d: key-sized diff — each side collapses to (key, fp)
      // before the full-outer join
      t("changed_keys") {
        graft.ops.Maintenance.changedKeys(d,
          d.withColumn("n_chars", col("n_chars") + (col("doc_id") % 2)),
          Seq("doc_id")).count()
      }
      // round 9d: trimmed mean — two keyed aggs + broadcast bounds;
      // group count is fixed, so the curve must track the scan
      t("trimmed_mean") {
        graft.ops.Profile.trimmedMean(d, "n_chars", Seq("lang")).count()
      }
      // round 9d: throttle — repartition + in-partition scan, O(1)
      // state; must track the shuffle, never blow up per key
      t("throttle") {
        graft.ops.Behavior.throttle(
          d.select(col("doc_id").as("event_id"),
            (col("doc_id") % 997).as("user_id"),
            timestamp_seconds(col("doc_id") % 100000).as("ts")),
          "ts", "user_id", "event_id", gapSeconds = 60).count()
      }
      // round 9d: curriculum ordinal — range sort + per-partition
      // offsets; one count row per partition to the driver
      t("global_ordinal") {
        graft.ops.Sampling.globalOrdinal(d, "doc_id", "n_chars").count()
      }
      // round 9e: BPE apply — narrow replace chain, must track the scan
      t("bpe_apply") {
        graft.ops.TextAnalysis.bpeApplyMerges(d, "doc_id", "text",
          Seq("t" -> "h", "th" -> "e", "a" -> "n", "an" -> "d")).count()
      }
      // round 9e: chunked langId rollup — explode + two keyed aggs
      t("lang_purity") {
        graft.ops.TextAnalysis.langPurity(d, "doc_id", "text").count()
      }
      // round 9e: incremental minhash — batch signatures vs the seen
      // store's matching buckets (the seen side grows with m)
      t("minhash_incremental") {
        graft.ops.Dedup.minhashIncrementalPairs(
          docs.withColumn("doc_id", col("doc_id") + 100000000L), d,
          "doc_id", "text", threshold = 0.9).count()
      }
      // round 10: boilerplate removal — amplified copies multiply every
      // chunk's DISTINCT-doc frequency, so the boilerplate set saturates
      // (at x>=2 every chunk crosses minDocs); time must track the
      // explode + one chunk-keyed shuffle, never candidates²
      t("boilerplate") {
        graft.ops.TextAnalysis.boilerplateChunks(
          d, "doc_id", "text", window = 8, minDocs = 2).count()
      }
      // round 10: packed-register HyperBall — the lineitem co-occurrence
      // graph amplified via Nx group-id copies (edge count scales ~Nx,
      // ball sizes stay put): the merge round ships ONE m-byte buffer
      // per edge, so time must track E, never E × ball
      t("hyperball") {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_orderkey") % 10 === 0)
        val liN = (0 until m).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L))
            .withColumn("l_partkey", col("l_partkey") + lit(i * 1000000000L)))
          .reduce(_ unionAll _)
        graft.ops.Graph.neighborhoodSizes(
          graft.ops.Graph.coOccurrenceEdges(liN, "l_orderkey", "l_partkey",
            maxGroup = 64), radius = 2, m = 512).count()
      }
      // round 10: novelty — Nx corpus scored against the FIXED reference
      // slice: both sides collapse to distinct gram hashes; time must
      // track the corpus explode + anti join, reference cost constant
      t("novelty") {
        graft.ops.Contamination.novelty(
          d.where(col("doc_id") % 7 =!= 0),
          docs.where(col("doc_id") % 7 === 0),
          "doc_id", "text").count()
      }
      // round 10: bitext margin mining — fixed broadcast query side vs
      // an Nx corpus side: the BNL scales with |B| per query, linear in
      // the corpus, and the top-2 window runs on the group-limited slice
      t("bitext") {
        Similarity.bitextMine(
          embs.where(col("vec_id") % 2 === 0)
            .where(col("vec_id") < 500),
          e.where(col("vec_id") % 2 === 1),
          minMargin = 0.01).count()
      }
      // round 11: BOTH sides grow with m — the two-large-sides regime the
      // BNL cannot take. Candidate volume is bucket-governed, so the
      // curve must stay far below the m² an all-pairs join would show
      // (amplified exact twins densify buckets: the worst-ish case)
      t("bitext_scalable") {
        Similarity.bitextMineScalable(
          e.where(col("vec_id") % 2 === 0),
          e.where(col("vec_id") % 2 === 1),
          minMargin = 0.01).count()
      }
      // round 11: weighted Jaccard — amplified copies are exact multiset
      // twins, so candidates track true duplicate pairs (C(m,2)·docs);
      // the expansion itself is a narrow ~tokens-per-doc explode
      t("weighted_jaccard") {
        Dedup.weightedJaccardPairs(d, "doc_id", "text",
          threshold = 0.7).count()
      }
      // round 11: stratified containment — the band ladder multiplies
      // banding rows by (32 + k)/16 vs plain containment, and amplified
      // twins densify every level's buckets; time must track duplicate
      // pairs, never corpus²
      t("containment_stratified") {
        Dedup.containmentPairsStratified(d, "doc_id", "text",
          threshold = 0.7).count()
      }
      // round 11: deep-iteration pagerank with lineage truncation — at
      // iters=10 the untruncated plan is 10 join+agg generations deep;
      // checkpointEvery=3 must hold wall-clock ~flat vs the shallow run
      // (the probe would hang/blow the driver if plan growth compounded)
      t("pagerank_iters10_ckpt") {
        // amplify the SUPPLIER ids only — l_orderkey must keep joining
        // the (unamplified) orders table, each copy then contributes a
        // fresh supplier-side node set and ~Nx edges
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_orderkey") % 10 === 0)
        val liN = (0 until m).map(i =>
          li.withColumn("l_suppkey", col("l_suppkey") + lit(i * 1000000000L)))
          .reduce(_ unionAll _)
        val ord = spark.read.parquet(s"$dir/orders.parquet")
        graft.ops.Graph.pagerank(
          graft.ops.Graph.supplierCustomerEdges(liN, ord),
          iters = 10, checkpointEvery = 3).count()
      }
      t("oph_pairs") {
        Dedup.minhashPairsOPH(d, "doc_id", "text", threshold = 0.9).count()
      }
      t("hamming_pairs") {
        Similarity.hammingNeighbors(e, maxHamming = 3).count()
      }
      t("importance") {
        graft.ops.Sampling.importanceWeights(d, "doc_id", "text",
          col("lang") === "en", 128).count()
      }
      t("dup_runs") {
        graft.ops.TextAnalysis.dupRuns(d, "doc_id", "text").count()
      }
      // round 14: the rank/contingency statistics are distributed-CDF
      // machines — the claim is NO GLOBAL WINDOW anywhere. Two regimes:
      // fixed value cardinality (amplified copies multiply per-value
      // counts, the CDF table stays constant-size — mannwhitney/kruskal)
      // and growing cardinality (fresh hashed values per copy, the CDF
      // table itself grows linearly — bh_adjust/spearman). Both must
      // track the scan + ONE range-partitioned exchange.
      t("mannwhitney") {
        val ev2 = amplify(graft.queries.Tables.events(spark, dir),
          "event_id", m)
        graft.ops.Drift.mannWhitney(
          ev2.where(col("event_type") === "purchase").select("value"),
          ev2.where(col("event_type") === "click").select("value"),
          "value").count()
      }
      t("wilcoxon") {
        // paired rows grow m-fold; |d| cardinality stays bounded by the
        // n_chars range — the tie-heavy regime
        graft.ops.Drift.wilcoxonSignedRank(
          d.select(col("n_chars").cast("double").as("before"),
            (col("n_chars") + col("doc_id") % 5 - 2).cast("double")
              .as("after")),
          "before", "after").count()
      }
      t("spearman") {
        // doc_id is shift-amplified: the x-axis midrank table grows
        // m-fold (distinct ids), the y-axis stays vocabulary-bounded
        graft.ops.Drift.spearman(d, "doc_id", "n_chars").count()
      }
      t("bh_adjust") {
        // fresh hash p per amplified id: ~all-distinct p values, the
        // worst case for the rank machinery (CDF rows = hypotheses)
        val p = d.select(col("doc_id"),
          (graft.functions.TextFunctions.h32raw(col("doc_id").cast("string"))
            .cast("double") / 4294967296.0).as("p"))
        graft.ops.Drift.bhAdjust(p, Seq("doc_id"), "p", alpha = 0.05)
          .count()
      }
      t("kruskal") {
        val o = spark.read.parquet(s"$dir/orders.parquet")
        val oN = (0 until m).map(i =>
          o.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L)))
          .reduce(_ unionAll _)
        graft.ops.Drift.kruskalWallis(oN, "o_orderpriority",
          "o_totalprice").count()
      }
      // round 14b: the drift/variance additions — bin/cell-cardinality
      // machines (psi/anova/mi) stay flat-to-linear; wasserstein rides
      // the ksStatistic CDF (value cardinality constant under copies);
      // distinct_n is gram-vocabulary work; acf is grid-cardinality
      // after the first rollup; qld grows with corpus × |Q|.
      def ordersN = {
        val o = spark.read.parquet(s"$dir/orders.parquet")
        (0 until m).map(i =>
          o.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L)))
          .reduce(_ unionAll _)
      }
      t("anova") {
        graft.ops.Drift.anovaF(ordersN, "o_orderpriority",
          "o_totalprice").count()
      }
      t("wasserstein") {
        val oN = ordersN
        graft.ops.Drift.wasserstein1(
          oN.where(col("o_orderkey") % 2 === 0),
          oN.where(col("o_orderkey") % 2 === 1), "o_totalprice").count()
      }
      t("psi") {
        val oN = ordersN
        graft.ops.Drift.psi(
          oN.where(col("o_orderkey") % 2 === 0),
          oN.where(col("o_orderkey") % 2 === 1), "o_totalprice").count()
      }
      t("mi") {
        graft.ops.Drift.mutualInformation(d, "lang", "source").count()
      }
      t("distinct_n") {
        graft.ops.TextAnalysis.distinctN(d, "text", "lang").count()
      }
      t("qld") {
        graft.ops.Retrieval.qldTopK(d, "doc_id", "text",
          Seq("join", "hash", "spark", "window"), k = 25).count()
      }
      t("acf") {
        graft.ops.TimeSeries.acf(
          amplify(graft.queries.Tables.events(spark, dir), "event_id", m),
          "ts", "event_type", maxLag = 24).count()
      }
      // round 14c: theilsen/mannkendall pair volume is per-key TIME²
      // (the grid is constant under event amplification — only counts
      // multiply), gini is value-cardinality work per group
      t("theilsen") {
        graft.ops.TimeSeries.theilSen(
          amplify(graft.queries.Tables.events(spark, dir), "event_id", m),
          "ts", "event_type").count()
      }
      t("mannkendall") {
        graft.ops.TimeSeries.mannKendall(
          amplify(graft.queries.Tables.events(spark, dir), "event_id", m),
          "ts", "event_type").count()
      }
      t("gini") {
        graft.ops.Profile.gini(d, "n_chars", Seq("lang")).count()
      }
      // round 16: the round-14 graph trio. Edges come from the lineitem
      // co-occurrence pass with ORDER keys amplified (each copy is a
      // disjoint component of ~equal size, so edges/triangles scale ~Nx
      // while per-node degree stays put — the sharding regime a 100x
      // corpus produces). clustering must track the triangle pass
      // (degree-oriented wedge join, never degree²-unbounded);
      // degree_alpha is one map-side degree count + a one-row ×2^20 ln
      // fold; reciprocity is distinct + reversed-key semi join on the
      // behavioral transition edges (event amplification multiplies
      // edge WEIGHT, distinct edges stay vocabulary-bounded — the
      // flat-curve expectation).
      def liEdgesN = {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_orderkey") % 10 === 0)
        val liN = (0 until m).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L))
            .withColumn("l_partkey", col("l_partkey") + lit(i * 1000000000L)))
          .reduce(_ unionAll _)
        graft.ops.Graph.coOccurrenceEdges(liN, "l_orderkey", "l_partkey",
          maxGroup = 64)
      }
      t("graph_clustering") {
        graft.ops.Graph.clusteringCoefficients(liEdgesN).count()
      }
      t("graph_degree_alpha") {
        graft.ops.Graph.degreePowerLaw(liEdgesN, dMin = 2).count()
      }
      // round 16: the segmented statistics — per-segment work is
      // value/segment-cardinality-bounded (amplified copies multiply
      // counts, never the per-group CDF tables or the segment set), so
      // both must stay ~flat after the one keyed shuffle
      t("ks_grouped") {
        val ev2 = amplify(graft.queries.Tables.events(spark, dir),
          "event_id", m)
        graft.ops.Drift.ksByGroup(
          ev2.where(col("event_id") % 2 === 0),
          ev2.where(col("event_id") % 2 === 1),
          "event_type", "value").count()
      }
      t("proportions_segments") {
        val ev2 = amplify(graft.queries.Tables.events(spark, dir),
          "event_id", m)
          .select(expr("((unix_micros(ts) div 3600000000) % 24) div 4")
            .cast("string").as("seg"),
            concat(lit("g"), (col("user_id") % 2).cast("string"))
              .as("arm"),
            (col("event_type") === "purchase").as("s"))
        graft.ops.Drift.proportionsBySegment(ev2, "seg", "arm", "s",
          "g0", "g1").count()
      }
      // round 17: ONE stratum whose DISTINCT-value cardinality grows
      // with m (jittered copies multiply distinct values, not counts —
      // the exact shape that serializes the per-group window on one
      // partition). `_routed` forces the distributed range-partitioned
      // route (the skew guard); `_window` pins the old single-window
      // behavior for the comparison curve.
      def skewSides() = {
        val ev = graft.queries.Tables.events(spark, dir)
          .where(col("value").isNotNull)
        val evN = (0 until m).map(i =>
            ev.withColumn("value", col("value") + lit(i * 1e9))
              .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
          .reduce(_ unionAll _)
          .withColumn("g", lit("skew"))
        (evN.where(col("event_id") % 2 === 0),
          evN.where(col("event_id") % 2 === 1))
      }
      t("ks_grouped_skew_routed") {
        val (sa, sb) = skewSides()
        graft.ops.Drift.ksByGroup(sa, sb, "g", "value",
          maxGroupDistinct = 50000L).count()
      }
      t("ks_grouped_skew_window") {
        val (sa, sb) = skewSides()
        graft.ops.Drift.ksByGroup(sa, sb, "g", "value",
          maxGroupDistinct = Long.MaxValue).count()
      }
      // round 17: sequential/segmented statistics (look/segment-
      // cardinality-bounded aggregates) and the quantization-bounded
      // HL pair table — all must stay ~flat past the scan
      def evStats() = amplify(graft.queries.Tables.eventsRaw(spark, dir),
          "event_id", m)
        .select(expr("((ts div 3600000000) % 24) div 3").as("look"),
          expr("CAST(((ts div 3600000000) % 24) div 4 AS STRING)")
            .as("seg"),
          concat(lit("g"), (col("user_id") % 2).cast("string")).as("arm"),
          col("value"), col("event_type"))
      t("sequential_mean") {
        graft.ops.Drift.sequentialMSPRTMean(evStats(), "look", "arm",
          "value", "g0", "g1", tauSq = 1.0).count()
      }
      t("welch_segments") {
        graft.ops.Drift.welchBySegment(evStats(), "seg", "arm", "value",
          "g0", "g1").count()
      }
      t("hodges_lehmann") {
        val e = evStats()
        def side(t: String) = e.where(col("event_type") === t)
          .select(round(col("value")).as("value"))
        graft.ops.Drift.hodgesLehmann(side("purchase"), side("click"),
          "value").count()
      }
      t("script_mix") {
        graft.ops.TextAnalysis.scriptMix(
          amplify(docs, "doc_id", m), "doc_id", "text").count()
      }
      t("graph_reciprocity") {
        import org.apache.spark.sql.expressions.Window
        val evN = amplify(graft.queries.Tables.events(spark, dir),
          "event_id", m)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val edges = evN
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .where(col("prev").isNotNull)
          .select(col("prev").as("src"), col("event_type").as("dst"))
        graft.ops.Graph.reciprocity(edges).count()
      }
      // round-18 additions: trigram-KN model build+score, ordered-EMD
      // t-closeness, unigram Viterbi-EM learn and fixed-vocab encode
      t("kn_score") {
        graft.ops.LanguageModel.knTrigramCrossEntropy(d, "doc_id", "text",
          Seq("lang")).count()
      }
      t("tcloseness") {
        graft.ops.Pii.tClosenessProfile(d, Seq("lang", "source"),
          "n_chars", t = 0.2).count()
      }
      t("unigram_learn") {
        graft.ops.Unigram.learn(d, "text", vocabSize = 24,
          seedSize = 48).count()
      }
      t("unigram_encode") {
        graft.ops.Unigram.encode(d, "doc_id", "text",
          ('a' to 'z').map(c => c.toString -> -4.5)).count()
      }
      // round-18 second batch: robust/ratio statistics (distinct-value
      // or cell-bounded work), wordpiece (distinct-word bound), k-center
      // (k corpus passes), katz (iters join rounds)
      t("yuen") {
        graft.ops.Drift.yuenTrimmed(
          ev.where(col("event_type") === "purchase").select("value"),
          ev.where(col("event_type") === "click").select("value"),
          "value").count()
      }
      t("ratio_delta") {
        val units = ev.groupBy(col("user_id"))
          .agg((sum(round(col("value") * 1048576d).cast("long"))
            / 1048576d).as("num"),
            count(lit(1)).cast("double").as("den"))
          .select(concat(lit("g"), (col("user_id") % 2).cast("string"))
            .as("arm"), col("num"), col("den"))
        graft.ops.Drift.ratioDelta(units, "arm", "num", "den",
          "g0", "g1").count()
      }
      t("cmh") {
        graft.ops.Drift.cmh(
          ev.select(expr("(user_id div 2) % 4").cast("string").as("seg"),
            concat(lit("g"), (col("user_id") % 2).cast("string"))
              .as("arm"),
            (col("event_type") === "purchase").as("success")),
          "seg", "arm", "success", "g0", "g1").count()
      }
      t("conformal") {
        graft.ops.Classify.conformal(
          ev.where(col("event_id") % 4 === 1)
            .select(col("value").as("y"), lit(10.0).as("yhat")),
          ev.where(col("event_id") % 4 === 3)
            .select(col("value").as("y"), lit(10.0).as("yhat")),
          "y", "yhat").count()
      }
      t("wordpiece_encode") {
        graft.ops.Wordpiece.encode(d, "doc_id", "text",
          ('a' to 'z').map(_.toString) ++
            ('a' to 'z').map(c => "##" + c)).count()
      }
      t("kcenter") {
        Similarity.kcenter(e, k = 6).count()
      }
      t("katz") {
        graft.ops.Graph.katz(
          ev.select(concat(lit("u"), col("user_id")).as("src"),
            col("event_type").as("dst")),
          iters = 3, alphaNum = 30, alphaDen = 1000).count()
      }
      // round 19: byte-level BPE application over the distinct-word
      // table — cost should track the word pass, not merge count
      t("bytebpe_encode") {
        graft.ops.ByteBpe.encode(d, "doc_id", "text",
          Seq("74" -> "68", "7468" -> "65", "69" -> "6E",
            "61" -> "6E", "616E" -> "64", "65" -> "72")).count()
      }
      // round 19: HTML extraction — one scan + one doc-key shuffle of
      // the kept text; markup synthesized per doc so bytes grow with N
      t("html_extract") {
        graft.ops.Html.extract(
          d.select(col("doc_id"), concat(
            lit("<nav><a href=x>L</a> <a href=y>M</a></nav><p>"),
            col("text"),
            lit("</p><footer><a href=z>F</a></footer>")).as("html")),
          "doc_id", "html").count()
      }
      // round 19: mojibake repair — a pure projection; curve must be
      // the scan line
      t("fix_encoding") {
        graft.ops.Mojibake.repair(
          d.select(col("doc_id"),
            regexp_replace(col("text"), "the", "thÃ©").as("text")),
          "doc_id", "text").count()
      }
      // round 19: targeted delete of a FIXED 5-id set from an Nx layout
      // — the delete must track hit blocks (≈flat), not the corpus (the
      // build outside the timer grows instead)
      if (only("targeted_delete")) {
        val pts = e.select(pmod(col("vec_id"), lit(64L)).as("x"),
          expr("(vec_id div 64) % 64").as("y"), col("vec_id").as("id"))
        val delDir = java.nio.file.Files
          .createTempDirectory(s"graft_sp_del$m").toString
        graft.ops.Layout.zorderWrite(pts, "x", "y", "id", delDir,
          blockSize = 4096, bits = 6,
          options = Map("confirm.truncate" -> "true"))
        graft.ops.Layout.bloomAugment(spark, delDir, "id",
          mBits = 1 << 16, k = 5,
          options = Map("confirm.truncate" -> "true"))
        t("targeted_delete") {
          graft.ops.Layout.targetedDelete(spark, delDir, "id",
            Seq(1L, 2L, 3L, 4L, 5L), Map("confirm.delete" -> "true"))
            .collect().head.getAs[Long]("n_rows_deleted")
        }
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(delDir))
      }
      // round 19: HITS — the pagerank cost profile minus the degree
      // join; per round two edge joins + two 1-row normalizations
      t("hits") {
        graft.ops.Graph.hits(
          ev.select(concat(lit("u"), col("user_id")).as("src"),
            col("event_type").as("dst")), iters = 2).count()
      }
      // round 19: DBSCAN — amplification duplicates embeddings, so the
      // TRUE pair count (and hence candidate work) grows ~m² by
      // construction; the curve documents output growth, not a plan
      // defect (the banding still never does all-pairs)
      t("dbscan") {
        Similarity.dbscan(e, 0.2, minPts = 4).count()
      }
      // round 19: silhouette — centroids grow with n at fixed
      // centroidEvery (the IVF convention), so point×centroid scoring
      // is the kmeans assignment curve
      t("silhouette") {
        Similarity.silhouette(e).count()
      }
      // round 19: DTW — amplification multiplies per-bucket counts,
      // not the hour range: series length is FLAT, so the curve must
      // be the events scan + hourly aggregate
      t("dtw") {
        graft.ops.TimeSeries.dtw(ev, "ts", "event_type", band = 24)
          .count()
      }
      // round 19: RM3 — two qld passes + a fbDocs-bounded tf pass
      t("rm3") {
        graft.ops.Retrieval.rm3TopK(d, "doc_id", "text",
          Seq("join", "hash", "spark", "window"), k = 25).count()
      }
      // round 19: Krippendorff alpha over the 3-rater langid fixture
      t("krippendorff") {
        val rated = graft.ops.TextAnalysis
          .langId(d, "doc_id", "text", "lang")
          .join(d.select(col("doc_id"), col("n_chars")), "doc_id")
          .select(col("doc_id"), col("lang").as("r1"),
            col("predicted").as("r2"),
            when(col("n_chars") >= 300, col("predicted")).as("r3"))
        graft.ops.Classify
          .krippendorffAlpha(rated, "doc_id", Seq("r1", "r2", "r3"))
          .count()
      }
      // round 19: k-truss over (hour, event_type)-bucket user
      // co-occurrence — ~28 users per bucket at x1 (under the 256
      // group cap at every multiplier), dense enough that triangles
      // and a non-empty 3-truss exist; edges grow with m as buckets
      // fill, the honest curve for a densifying graph
      t("ktruss") {
        graft.ops.Graph.kTruss(
          graft.ops.Graph.coOccurrenceEdges(
            ev.withColumn("gb", concat(date_trunc("hour", col("ts")),
              col("event_type"))),
            "gb", "user_id", maxGroup = 256),
          k = 3, rounds = 3).count()
      }
      // round 19: randomized response — a broadcast-rank projection +
      // one count; must ride the scan line
      t("randomized_response") {
        graft.ops.Pii.randomizedResponseCounts(d, "doc_id", "lang")
          .count()
      }
      // round 19: Heaps growth curve — two checkpoint aggregates; the
      // doc-level ×C fan-out is constant-bounded
      t("heaps") {
        graft.ops.TextAnalysis.heapsLaw(d, "doc_id", "text").count()
      }
      graft.util.Caches.unpersistAll()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

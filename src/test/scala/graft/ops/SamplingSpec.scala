package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("deterministic sampling: reproducible, monotone in rate, salt-independent draws") {
    val ids = Sampling.deterministic(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val again = Sampling.deterministic(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == again, "same rate + salt -> same subset, always")
    val bigger = Sampling.deterministic(docs, "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(bigger), "raising the rate only adds rows")
    val salted = Sampling.deterministic(docs, "doc_id", 0.3, salt = "v2")
      .select("doc_id").as[Long].collect().toSet
    assert(salted != ids, "a new salt draws a different subset")
    val n = docs.count()
    assert(math.abs(ids.size.toDouble / n - 0.3) < 0.15,
      s"kept ${ids.size} of $n at rate 0.3")
    assert(Sampling.deterministic(docs, "doc_id", 0.0).isEmpty)
    assert(Sampling.deterministic(docs, "doc_id", 1.0).count() == n)
  }

  test("per-stratum head: exactly k per stratum, stable under repartitioning") {
    val out = Sampling.perStratumHead(docs, "lang", "doc_id", 7)
    val perLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ == 7L), s"not 7 per stratum: $perLang")
    val ids = out.select("doc_id").as[Long].collect().toSet
    val reshuffled = Sampling.perStratumHead(docs.repartition(13), "lang", "doc_id", 7)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == reshuffled, "subset must be a pure function of the ids")
    val redraw = Sampling.perStratumHead(docs, "lang", "doc_id", 7, salt = "v2")
      .select("doc_id").as[Long].collect().toSet
    assert(redraw != ids, "a new salt draws a different balanced subset")
  }

  test("stratified sampling applies per-stratum rates") {
    val out = Sampling.stratified(docs, "lang", "doc_id",
      Map("de" -> 0.0), defaultRate = 1.0)
    assert(out.where($"lang" === "de").isEmpty, "rate-0 stratum fully dropped")
    val others = docs.where($"lang" =!= "de").count()
    assert(out.count() == others, "default rate 1.0 keeps every other stratum")
  }

  test("shard_by_budget equals the single-partition window form") {
    val sharded = Sampling.shardByBudget(docs, "doc_id", "n_chars",
      budget = 50000L, numPartitions = 7)
    docs.createOrReplaceTempView("ss_docs")
    val oracle = spark.sql("""
      SELECT doc_id, n_chars,
        CAST(floor(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 50000) AS BIGINT) AS shard
      FROM ss_docs""")
    assert(datasetEquality(oracle, sharded))
  }

  test("shards pack to the budget: no shard exceeds budget + one document") {
    val sums = Sampling.shardByBudget(docs, "doc_id", "n_chars", budget = 20000L)
      .groupBy("shard").agg(sum("n_chars").as("s"), max("n_chars").as("mx"))
      .as[(Long, Long, Long)].collect()
    sums.foreach { case (shard, s, mx) =>
      assert(s <= 20000L + mx, s"shard $shard holds $s tokens (max doc $mx)")
    }
    // shards are consecutive starting at 0
    val shards = sums.map(_._1).sorted
    assert(shards.head == 0L && shards.last == shards.length - 1)
  }

  test("shard assignment never plans a one-partition window") {
    val plan = Sampling.shardByBudget(docs, "doc_id", "n_chars", budget = 50000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-partition window in plan:\n$plan")
  }

  test("deterministicShuffle equals the single-partition window form") {
    val shuffled = Sampling.deterministicShuffle(docs, "doc_id",
      salt = "ep0", numPartitions = 7)
    docs.createOrReplaceTempView("sh_docs")
    val oracle = spark.sql(s"""
      SELECT doc_id, row_number() OVER (
          ORDER BY CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), 'ep0')), 1, 8), 16, 10) AS BIGINT) % ${graft.functions.TextFunctions.P},
            doc_id) - 1 AS pos
      FROM sh_docs""")
    assert(datasetEquality(oracle, shuffled))
    graft.util.Caches.unpersistAll()
  }

  test("deterministicShuffle: permutation of 0..n-1, re-dealt by salt, no window") {
    val n = docs.count()
    val s1 = Sampling.deterministicShuffle(docs, "doc_id", salt = "ep0")
    assert(s1.agg(min("pos"), max("pos"), countDistinct("pos"))
      .as[(Long, Long, Long)].head() == (0L, n - 1, n))
    val s2 = Sampling.deterministicShuffle(docs, "doc_id", salt = "ep1")
    val moved = s1.as("a").join(s2.as("b"), "doc_id")
      .where($"a.pos" =!= $"b.pos").count()
    assert(moved > n / 2, s"salt change barely moved the order ($moved/$n)")
    assert(!s1.queryExecution.executedPlan.toString.contains("Window"))
    graft.util.Caches.unpersistAll()
  }

  test("globalOrdinal equals the single-partition window form, no window") {
    val ord = Sampling.globalOrdinal(docs, "doc_id", "n_chars",
      numPartitions = 7)
    docs.createOrReplaceTempView("go_docs")
    val oracle = spark.sql(
      """SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) - 1
           AS pos
         FROM go_docs""")
    assert(datasetEquality(oracle, ord))
    assert(!ord.queryExecution.executedPlan.toString.contains("Window"))
    graft.util.Caches.unpersistAll()
  }

  test("globalOrdinal is a layout-independent permutation of 0..n-1") {
    val n = docs.count()
    val a = Sampling.globalOrdinal(docs, "doc_id", "n_chars")
    assert(a.agg(min("pos"), max("pos"), countDistinct("pos"))
      .as[(Long, Long, Long)].head() == (0L, n - 1, n))
    val b = Sampling.globalOrdinal(docs.repartition(13), "doc_id", "n_chars")
    assert(a.orderBy("pos").collect().toSeq ==
      b.orderBy("pos").collect().toSeq)
    graft.util.Caches.unpersistAll()
  }

  test("shardManifest: exact counts/sums, checksum moves on any membership change") {
    val df = (1L to 40L).map(i => (i, 100L)).toDF("doc_id", "n_chars")
    val m = Sampling.shardManifest(df, "doc_id", "n_chars", budget = 1000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m.values.map(_._1).sum == 40L)
    assert(m.values.map(_._2).sum == 4000L)
    // dropping one doc changes exactly its shard's checksum
    val m2 = Sampling.shardManifest(df.where($"doc_id" =!= 5L), "doc_id",
      "n_chars", budget = 1000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(0L)._3 != m2(0L)._3, "checksum must move when a member drops")
    graft.util.Caches.unpersistAll()
  }

  test("leakageSafeSplit: cluster members share a split; singletons = splitAssign") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "component")
    val ids = (1L to 50L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val out = Sampling.leakageSafeSplit(ids, "doc_id", comps,
      Seq("train" -> 0.5, "test" -> 0.5), salt = "t")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1, "cluster 1 together")
    assert(Set(out(10L), out(11L)).size == 1, "cluster 10 together")
    val plain = Sampling.splitAssign(ids, "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5), salt = "t")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val singles = (1L to 50L).filterNot(Set(1L, 2L, 3L, 10L, 11L))
    assert(singles.forall(i => out(i) == plain(i)),
      "unclustered rows split exactly like splitAssign")
    assert(out.size == 50)
  }

  test("topFractionPerStratum: exact per-stratum k, deterministic ties") {
    // strata: a has 10 rows, b has 4; p = 0.25 -> k_a = 3 (ceil 2.5),
    // k_b = 1
    val df = ((1 to 10).map(i => (i.toLong, "a", i.toLong)) ++
      (11 to 14).map(i => (i.toLong, "b", 100L))).toDF("id", "s", "score")
    val out = Sampling.topFractionPerStratum(df, "s", "score", "id", 0.25)
      .select("id", "s", "rank")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((10L, "a", 1L), (9L, "a", 2L), (8L, "a", 3L),
      (11L, "b", 1L)), s"got $out")
  }

  test("topFractionPerStratum: p=1 keeps everything, layout-independent") {
    val out = Sampling.topFractionPerStratum(docs, "lang", "n_chars",
      "doc_id", 1.0)
    assert(out.count() == docs.count())
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.topFractionPerStratum(d, "lang", "n_chars", "doc_id", 0.3)
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(9)))
    graft.util.Caches.unpersistAll()
  }

  test("upsample replicates by integer weight plus a deterministic fraction") {
    val out = Sampling.upsample(docs, "lang", "doc_id",
      Map("de" -> 3.0, "en" -> 0.0), defaultWeight = 1.0)
    val counts = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val orig = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("de") == orig("de") * 3)       // integer weight: exact
    assert(!counts.contains("en"))               // weight 0 drops all
    assert(counts("fr") == orig("fr"))           // default 1.0: unchanged
    // copy column makes replicas distinct
    assert(out.distinct().count() == out.count())
    // fractional part is reproducible: two runs pick the same rows
    val a = Sampling.upsample(docs, "lang", "doc_id", Map("de" -> 1.5))
      .where($"lang" === "de" && $"copy" === 1).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.upsample(docs, "lang", "doc_id", Map("de" -> 1.5))
      .where($"lang" === "de" && $"copy" === 1).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b && a.nonEmpty && a.size < orig("de"))
  }

  test("splitAssign is a stable pure function of ids; fractions roughly hold") {
    val s1 = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = Sampling.splitAssign(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val m1 = s1.select("doc_id", "split").as[(Long, String)].collect().toMap
    val m2 = s2.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m1 == m2, "split must not depend on partitioning")
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.keySet == Set("train", "val", "test"))
    // schema preserved plus the one new column
    assert(s1.columns.toSeq == docs.columns.toSeq :+ "split")
  }

  test("weightedTopK favors heavy rows and plans a per-partition top-k") {
    val q = Sampling.weightedTopK(docs, "doc_id", "n_chars", k = 50)
    // heavier rows overrepresented: sampled mean length above corpus mean
    val sampleMean = q.agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus $corpusMean")
    assert(q.count() == 50)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  test("negativeSample: k draws per anchor, reproducible, never the anchor") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = Sampling.negativeSample(docs, "doc_id", k = 4, nBuckets = 32)
    val b = Sampling.negativeSample(docs.repartition(7), "doc_id", 4, 32)
    assert(a.orderBy("anchor_id", "i").collect().toSeq ==
      b.orderBy("anchor_id", "i").collect().toSeq) // layout-invariant
    assert(a.where($"neg_id" === $"anchor_id").count() == 0)
    val perAnchor = a.groupBy("anchor_id").count()
    assert(perAnchor.agg(max("count")).head.getLong(0) <= 4)
    // self-hit drops are rare (1/nBuckets per draw): most anchors keep 4
    assert(a.count() > docs.count() * 4 * 0.8)
  }

  test("negativeSample: a new salt redraws; reps table broadcasts") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val s1 = Sampling.negativeSample(docs, "doc_id", 2, 32, salt = "e1")
    val s2 = Sampling.negativeSample(docs, "doc_id", 2, 32, salt = "e2")
    val agree = s1.as("a").join(s2.as("b"),
      col("a.anchor_id") === col("b.anchor_id") && col("a.i") === col("b.i")
        && col("a.neg_id") === col("b.neg_id")).count()
    assert(agree < s1.count(), "different salts must redraw some negatives")
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket reps must broadcast:\n$plan")
  }

  test("packSequences: next-fit within budget, stable under partitioning") {
    val packed = Sampling.packSequences(docs, "doc_id", "n_chars",
      budget = 2000L, nBuckets = 8)
    // every doc appears exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // a pack never exceeds the budget unless it is a single oversized doc
    val over = packed.groupBy("bucket", "pack")
      .agg(sum("n_chars").as("tot"), count("*").as("n"))
      .where($"tot" > 2000L && $"n" > 1)
    assert(over.isEmpty, "multi-doc pack over budget")
    // next-fit is greedy: within a bucket, a doc only opens a new pack
    // when it would not fit in the previous one (checked via the local
    // replay of the same scan)
    val local = packed.select("bucket", "doc_id", "n_chars", "pack")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
    local.foreach { rows =>
      var pack = 0L; var cum = 0L; var first = true
      rows.sortBy(_._2).foreach { case (_, _, t, p) =>
        if (first) { first = false; cum = t }
        else if (cum + t > 2000L) { pack += 1; cum = t }
        else cum += t
        assert(p == pack, s"pack mismatch: got $p want $pack")
      }
    }
    // pure function of ids: layout does not matter
    val again = Sampling.packSequences(docs.repartition(13), "doc_id",
      "n_chars", 2000L, 8)
    assert(datasetEquality(packed, again))
  }

  test("rebalance solves rates so kept tokens match target proportions") {
    val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)
    val out = Sampling.rebalance(docs, "lang", "doc_id", "n_chars", targets)
    // unlisted stratum dropped
    assert(out.where($"lang" === "es").isEmpty)
    val kept = out.groupBy("lang").agg(sum("n_chars").as("tok"))
      .as[(String, Long)].collect().toMap
    val total = kept.values.sum.toDouble
    // kept shares approach the targets (hash sampling is ~rate, so allow
    // a loose band at 500 docs)
    targets.foreach { case (lang, share) =>
      val got = kept(lang) / total
      assert(math.abs(got - share) < 0.08,
        s"$lang share $got vs target $share")
    }
    // the binding stratum (max tokens relative to weight deficit) is kept whole
    val orig = docs.groupBy("lang").agg(sum("n_chars").as("tok"))
      .as[(String, Long)].collect().toMap
    val binding = targets.keys.minBy(l => orig(l).toDouble / targets(l))
    assert(kept(binding) == orig(binding),
      s"binding stratum $binding must keep everything")
    // schema preserved; corpus side must not shuffle (broadcast join)
    assert(out.columns.toSeq == docs.columns.toSeq)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
  }

  test("temperatureRebalance: sqrt flattening, smallest stratum binds") {
    val rows = (0 until 200).map(i => (i.toLong, "big", 100L)) ++
      (200 until 250).map(i => (i.toLong, "mid", 100L)) ++
      (250 until 260).map(i => (i.toLong, "small", 100L))
    val df = rows.toDF("doc_id", "lang", "n_chars")
    val out = Sampling.temperatureRebalance(df, "lang", "doc_id", "n_chars",
      alpha = 0.5)
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // rates ~ tok^(alpha-1): the smallest stratum binds and keeps all
    assert(kept("small") == 10L, s"smallest stratum must keep all: $kept")
    // keep FRACTIONS strictly flatten toward uniform: big < mid < small
    assert(kept("big").toDouble / 200 < kept("mid").toDouble / 50,
      s"fractions must order by stratum size: $kept")
    assert(kept("mid") < 50L)
    // deterministic under layout; schema preserved; rate table broadcast
    val again = Sampling.temperatureRebalance(df.repartition(7), "lang",
      "doc_id", "n_chars", alpha = 0.5)
    assert(again.orderBy("doc_id").collect().toSeq ==
      out.orderBy("doc_id").collect().toSeq)
    assert(out.columns.toSeq == df.columns.toSeq)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
  }

  test("perStratumTokenCap: budget honored, first draw always kept, stable") {
    val out = Sampling.perStratumTokenCap(docs, "source", "doc_id",
      "n_chars", budget = 2500L, salt = "cap0")
    // every source keeps at least one doc
    assert(out.select("source").distinct().count() ==
      docs.select("source").distinct().count())
    // kept tokens BEFORE the last kept doc stay under budget: total kept
    // minus the largest kept doc per stratum is < budget
    val agg = out.groupBy("source")
      .agg(sum("n_chars").as("tot"), max("n_chars").as("mx"))
      .where($"tot" - $"mx" >= 2500L)
    assert(agg.isEmpty, "cap overshot by more than the final document")
    // pure function of ids + salt: layout does not matter, salt redraws
    val again = Sampling.perStratumTokenCap(docs.repartition(13), "source",
      "doc_id", "n_chars", 2500L, salt = "cap0")
    assert(datasetEquality(out, again))
    val redraw = Sampling.perStratumTokenCap(docs, "source", "doc_id",
      "n_chars", 2500L, salt = "cap1")
      .select("doc_id").as[Long].collect().toSet
    assert(redraw != out.select("doc_id").as[Long].collect().toSet,
      "a new salt draws a different capped subset")
  }

  test("topFraction equals the single-partition window form, no Window node") {
    val top = Sampling.topFraction(docs, "n_chars", "doc_id", 0.1,
      numPartitions = 7)
    docs.createOrReplaceTempView("tf_docs")
    val n = docs.count()
    val k = math.ceil(0.1 * n).toLong
    val oracle = spark.sql(s"""
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS score, rank FROM (
        SELECT doc_id, n_chars, row_number() OVER (
          ORDER BY n_chars DESC, doc_id) AS rank
        FROM tf_docs) WHERE rank <= $k""")
    assert(datasetEquality(oracle, top))
    assert(top.count() == k)
    assert(!top.queryExecution.executedPlan.toString.contains("Window"))
    graft.util.Caches.unpersistAll()
  }

  test("systematicWeighted: slots sum to n, weight-proportional, no zeros") {
    val df = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val out = Sampling.systematicWeighted(df, "id", "w", n = 40, salt = "t")
      .collect()
    assert(out.map(_.getAs[Long]("n_slots")).sum == 40L)
    assert(out.forall(_.getAs[Long]("n_slots") >= 1L))
    graft.util.Caches.unpersistAll()
  }

  test("systematicWeighted: a row heavier than W/n claims multiple slots") {
    // total W = 1000+5+5 = 1010, n = 10 -> interval 101; the heavy row
    // must take ~9-10 slots
    val df = Seq((1L, 1000L), (2L, 5L), (3L, 5L)).toDF("id", "w")
    val out = Sampling.systematicWeighted(df, "id", "w", n = 10, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_slots")).toMap
    assert(out(1L) >= 9L)
    assert(out.values.sum == 10L)
    graft.util.Caches.unpersistAll()
  }

  test("systematicWeighted: non-positive weights dropped, layout-independent") {
    val rows = (1L to 100L).map(i =>
      (i, if (i % 10 == 0) 0L else i % 13 + 1))
    val df1 = rows.toDF("id", "w")
    val df2 = df1.repartition(9)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.systematicWeighted(d, "id", "w", n = 25, salt = "x",
        numPartitions = 5).orderBy("id").collect().toSeq
    val r1 = run(df1)
    assert(r1 == run(df2))
    assert(!r1.exists(_.getLong(0) % 10 == 0), "zero-weight rows dropped")
    // a different salt re-deals the axis: some selection difference
    val r2 = Sampling.systematicWeighted(df1, "id", "w", n = 25,
      salt = "y", numPartitions = 5).orderBy("id").collect().toSeq
    assert(r1.map(_.getLong(0)) != r2.map(_.getLong(0)),
      "a new salt draws a different systematic subset")
    graft.util.Caches.unpersistAll()
  }

  test("importanceWeights: target-vocab docs outscore source-only docs") {
    // target docs speak 'alpha', the rest speak 'omega'; a fresh doc in
    // each vocabulary must rank accordingly
    val df = Seq(
      (0L, "alpha alpha alpha", true),
      (1L, "alpha alpha", true),
      (2L, "omega omega omega", false),
      (3L, "omega omega omega omega", false),
      (4L, "alpha alpha alpha alpha", false), // target-like but unlabeled
      (5L, "", false)
    ).toDF("doc_id", "text", "is_tgt")
    // precondition: the two vocab words land in different buckets
    val b = df.sparkSession.range(1).select(
      graft.functions.TextFunctions.h32(lit("alpha")) % 128,
      graft.functions.TextFunctions.h32(lit("omega")) % 128)
      .first()
    assert(b.getLong(0) != b.getLong(1), "fixture words collide; pick others")
    val out = Sampling.importanceWeights(df, "doc_id", "text",
        col("is_tgt"), buckets = 128)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val score = out.map(r => r._1 -> r._3).toMap
    assert(score(4L) > score(2L),
      "an unlabeled doc in the target vocabulary must outscore source vocab")
    // per-token rate ordering (absolute sign depends on the +1-per-bucket
    // smoothing mass, which dwarfs a 6-doc fixture's counts)
    assert(score(4L) / 4 > score(2L) / 3,
      "target-vocab tokens must carry a higher log-ratio than source vocab")
    assert(out.find(_._1 == 5L).get == ((5L, 0L, 0.0)),
      "empty text keeps the row with zero tokens and zero score")
    // per-token additivity of the fixed-point bucket ratio
    assert(math.abs(score(0L) / 3 - score(1L) / 2) < 1e-9,
      "same-vocab docs score proportional to token count")
    graft.util.Caches.unpersistAll()
  }

  test("rendezvousShard: k -> k+1 moves ONLY docs claimed by the new " +
      "shard; mod-hashing moves almost everything") {
    val d = docs.select("doc_id")
    def assign(k: Int): Map[Long, Long] =
      Sampling.rendezvousShard(d, "doc_id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at8 = assign(8)
    val at9 = assign(9)
    assert(at8.values.toSet.size == 8, "all 8 shards populated")
    val moved = at8.keys.filter(id => at8(id) != at9(id)).toSeq
    assert(moved.nonEmpty, "the new shard must claim some docs")
    assert(moved.forall(id => at9(id) == 8L),
      "a doc may move ONLY to the newly added shard")
    val frac = moved.size.toDouble / at8.size
    assert(frac > 0.03 && frac < 0.25,
      s"~1/9 of docs should move, got $frac")
    // determinism + layout invariance
    assert(assign(8) == at8)
    assert(Sampling.rendezvousShard(d.repartition(7), "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == at8)
  }

  test("importanceWeights: layout-invariant and exactly reproducible") {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))
    val a = Sampling.importanceWeights(base, "doc_id", "text",
      col("lang") === "en", buckets = 64).orderBy("doc_id").collect().toSeq
    val b = Sampling.importanceWeights(base.repartition(13), "doc_id",
      "text", col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "score must be a pure function of the corpus")
    assert(a.size == base.count(), "every input row keeps a score")
    graft.util.Caches.unpersistAll()
  }

  test("paretoFront: hand-built skyline, coordinate ties survive, nulls drop") {
    val df = Seq(
      (1L, 5L, 1.0),   // front: max x
      (2L, 3L, 3.0),   // front
      (3L, 3L, 2.0),   // dominated by 2 (same x, smaller y)
      (4L, 1L, 3.0),   // dominated by 2 (smaller x, same y)
      (5L, 2L, 4.0),   // front
      (6L, 2L, 4.0),   // identical to 5: both survive
      (7L, 4L, 1.0)    // dominated by 1 (x 5 >= 4, y 1 >= 1, one strict)
    ).toDF("id", "x", "y")
    val got = Sampling.paretoFront(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 5L, 6L))
    // null coordinates drop even when they would otherwise dominate
    val withNull = df.unionByName(
      Seq((8L, Some(9L), Option.empty[Double])).toDF("id", "x", "y"))
    assert(Sampling.paretoFront(withNull, "x", "y")
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 5L, 6L))
    graft.util.Caches.unpersistAll()
  }

  test("paretoFront matches the O(n^2) dominance definition on a random batch") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toDouble))
    val got = Sampling.paretoFront(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    val want = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, sx, sy) =>
        sx >= x && sy >= y && (sx > x || sy > y)
      }
    }.map(_._1).toSet
    assert(got == want)
    graft.util.Caches.unpersistAll()
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters in 4-dim space, one seed (ids 0 and 5)
  // in each (centroidEvery = 5); subspaces = 2 x subDim = 2
  private def clustered = Seq(
    (0L, Array(1f, 0f, 1f, 0f)),
    (1L, Array(0.9f, 0.1f, 1f, 0f)),
    (2L, Array(1f, 0.1f, 0.9f, 0f)),
    (5L, Array(0f, 1f, 0f, 1f)),
    (6L, Array(0.1f, 0.9f, 0f, 1f)),
    (7L, Array(0f, 1f, 0.1f, 0.9f))
  ).toDF("vec_id", "embedding")

  test("train/encode: per-subspace codebooks, cluster-pure codes") {
    val cb = Pq.train(clustered, subspaces = 2, subDim = 2,
      centroidEvery = 5, iters = 1)
    // every subspace keeps both seed ids
    assert(cb.select("s", "c_id").collect().map(r =>
      (r.getInt(0), r.getLong(1))).toSet ==
      Set((0, 0L), (0, 5L), (1, 0L), (1, 5L)))
    val codes = Pq.encode(clustered, cb, subspaces = 2, subDim = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // codes are one id per subspace, and cluster members share them
    assert(codes.values.forall(_.size == 2))
    assert(codes(1L) == codes(2L) && codes(1L) == Seq(0L, 0L))
    assert(codes(6L) == codes(7L) && codes(6L) == Seq(5L, 5L))
    graft.util.Caches.unpersistAll()
  }

  test("adcTopK ranks same-cluster vectors first; self excluded") {
    val cb = Pq.train(clustered, subspaces = 2, subDim = 2,
      centroidEvery = 5, iters = 1)
    val codes = Pq.encode(clustered, cb, subspaces = 2, subDim = 2)
    val out = Pq.adcTopK(codes, cb,
        clustered.where(col("vec_id") === 1L), k = 5,
        subspaces = 2, subDim = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.length == 5, "all non-self corpus vectors ranked")
    assert(!out.map(_._1).contains(1L), "self pair must be excluded")
    // the two same-cluster, same-code neighbors come first (their ADC
    // distance is the query-to-own-centroid distance), cross-cluster last
    assert(out.take(2).map(_._1).toSet == Set(0L, 2L))
    assert(out(0)._2 == out(1)._2, "identical codes -> identical ADC")
    assert(out.drop(2).forall(_._2 > out(0)._2))
    graft.util.Caches.unpersistAll()
  }

  test("adcRecall: near-perfect on clustered data, reported honestly") {
    // 4 well-separated clusters x 6 members (k+1, so the exact top-5 is
    // EXACTLY the 5 cluster-mates — within a cluster ADC cannot
    // discriminate, codes are identical); ids ordered so
    // centroidEvery=6 seeds exactly one codebook entry per cluster
    val base = Seq(
      Array(10f, 0f, 0f, 0f, 10f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 10f, 0f),
      Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 10f))
    val docs = (0 until 24).map { i =>
      val c = base(i / 6)
      // deterministic small jitter so truth ranks are strict
      (i.toLong, c.zipWithIndex.map { case (v, d) =>
        v + ((i * 7 + d * 3) % 5) * 0.01f })
    }.toDF("vec_id", "embedding")
    val out = Pq.adcRecall(docs, docs.where($"vec_id" % 6 === 1), k = 5,
        subspaces = 2, subDim = 4, centroidEvery = 6, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size == 4)
    // every query's exact top-5 IS its cluster, and PQ retrieves it whole
    out.foreach { case (q, rec) =>
      assert(rec == 1.0, s"query $q recall $rec on separable clusters")
    }
    graft.util.Caches.unpersistAll()
  }

  test("ivfAdcTopK: probing every cell reproduces exhaustive ADC; " +
      "probes=1 prunes") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val cb = Pq.train(e, 8, 8, 25, 1)
    val exhaustive = Pq.adcTopK(Pq.encode(e, cb), cb, q, 5)
      .collect().map(_.toString).toSet
    // probes >= nCells: the cell join admits every non-self pair, so the
    // composition must equal the exhaustive ADC exactly
    val allCells = Pq.ivfAdcTopK(e, q, 5, cellEvery = 100, cellIters = 1,
        probes = 999)
      .collect().map(_.toString).toSet
    assert(allCells == exhaustive)
    // probes=1 returns at most k per query from a candidate SUBSET —
    // each reported pair's adist must equal its exhaustive value
    val pruned = Pq.ivfAdcTopK(e, q, 5, cellEvery = 100, cellIters = 1,
        probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    val exhaustivePairs = Pq.adcTopK(Pq.encode(e, cb), cb, q, 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    pruned.foreach { case (pair, d) =>
      assert(exhaustivePairs(pair) == d,
        s"pair $pair adist $d diverged from exhaustive")
    }
    graft.util.Caches.unpersistAll()
  }

  test("opqRotation is orthonormal, deterministic, layout-independent") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val rot = Pq.opqRotation(e)
    assert(rot.size == 64 && rot.forall(_.size == 64))
    for (i <- 0 until 64; j <- i until 64) {
      val d = (0 until 64).map(k => rot(i)(k) * rot(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-4, s"R·Rᵀ[$i][$j] = $d")
    }
    graft.util.Caches.unpersistAll()
    val again = Pq.opqRotation(e.repartition(13))
    assert(again == rot, "rotation must be a pure function of the data")
    graft.util.Caches.unpersistAll()
  }

  test("rotate preserves exact L2 neighbor order (orthonormal isometry)") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .where(col("vec_id") < 40)
    val rot = Pq.opqRotation(
      spark.read.parquet(s"$sf001/embeddings.parquet"))
    val r = Pq.rotate(e, rot)
    import graft.functions.VectorFunctions
    def norms(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), org.apache.spark.sql.functions.round(
        VectorFunctions.dot(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")), 3).as("n2"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val a = norms(e)
    val b = norms(r)
    a.foreach { case (id, n2) =>
      assert(math.abs(b(id) - n2) < 1e-2, s"norm of $id moved: $n2 -> ${b(id)}")
    }
    graft.util.Caches.unpersistAll()
  }

  test("adcRecallOpq >= adcRecall on an anisotropic clustered corpus " +
      "(the eigenvalue-allocation payoff), honest raw-L2 ground truth") {
    // low-rank diagonal structure: cluster geometry lives in 3 random
    // non-axis directions mixing all 64 dims — plain PQ's fixed
    // coordinate split smears it across every subspace; OPQ's PCA +
    // eigenvalue allocation concentrates it
    val rnd = new scala.util.Random(7)
    val dirs = Array.fill(3)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val coef = Array(i % 8 * 5.0, (i / 8) % 5 * 3.0,
        rnd.nextGaussian() * 0.2)
      (i.toLong, Array.tabulate(64)(d =>
        (coef(0) * dirs(0)(d) + coef(1) * dirs(1)(d)
          + coef(2) * dirs(2)(d) + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val q = rows.where(col("vec_id") < 15)
    def mean(df: org.apache.spark.sql.DataFrame) =
      df.agg(org.apache.spark.sql.functions.avg("recall"))
        .collect().head.getDouble(0)
    val plain = mean(Pq.adcRecall(rows, q, 10, centroidEvery = 25))
    graft.util.Caches.unpersistAll()
    val opq = mean(Pq.adcRecallOpq(rows, q, 10, centroidEvery = 25))
    graft.util.Caches.unpersistAll()
    assert(opq >= plain,
      s"OPQ recall $opq must not lose to plain PQ $plain here")
    assert(opq > 0.85, s"OPQ recall $opq should be high on clustered data")
  }

  test("PQ is layout-independent and ragged vectors drop") {
    val withRagged = clustered.unionByName(
      Seq((9L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding"))
    def run(d: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cb = Pq.train(d, subspaces = 2, subDim = 2,
        centroidEvery = 5, iters = 2)
      Pq.adcTopK(Pq.encode(d, cb, 2, 2), cb,
          d.where(col("vec_id") < 2), k = 3, subspaces = 2, subDim = 2)
        .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    }
    val base = run(withRagged)
    assert(run(withRagged.repartition(5)) == base)
    assert(!base.exists(_.contains("[9,")), "ragged vec 9 must not appear")
    graft.util.Caches.unpersistAll()
  }
}

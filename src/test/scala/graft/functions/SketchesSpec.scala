package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, expr, lit}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV is exact below k") {
    val df = (1 to 100).toDF("v")
    val r = Sketches.kmvDistinct(df, col("v"), k = 256).head()
    assert(r.getAs[Long]("exact_distinct") == 100L)
    assert(r.getAs[Double]("kmv_estimate") == 100.0)
  }

  test("KMV estimates within ~3/sqrt(k) above k") {
    val df = (1 to 20000).toDF("v")
    val r = Sketches.kmvDistinct(df, col("v"), k = 256).head()
    val est = r.getAs[Double]("kmv_estimate")
    val err = math.abs(est - 20000.0) / 20000.0
    assert(err < 3.0 / math.sqrt(256), s"estimate $est err $err")
  }

  test("KMV is deterministic across runs") {
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
    val a = Sketches.kmvDistinct(df, col("l_partkey"), 64).head()
    val b = Sketches.kmvDistinct(df, col("l_partkey"), 64).head()
    assert(a == b)
  }

  test("sampled quantiles track the exact quantile and survive repartitioning") {
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.sampledQuantiles(d,
        col("l_orderkey") * 10000 + col("l_linenumber"),
        col("l_extendedprice"), Seq("l_returnflag"), Seq(0.5), rate = 0.3)
        .orderBy("l_returnflag").collect().toSeq
    val est = run(df)
    // pure function of ids: any physical layout yields the identical rows
    assert(est == run(df.repartition(17)))
    // close to the exact quantile (30% sample at sf0.001 is still wide —
    // assert the estimate lands within 15% of truth per group)
    val exact = df.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    est.foreach { r =>
      val (flag, p50) = (r.getString(0), r.getDouble(1))
      val rel = math.abs(p50 - exact(flag)) / exact(flag)
      assert(rel < 0.15, s"$flag: sampled $p50 vs exact ${exact(flag)} ($rel)")
    }
  }

  test("hllDistinct: small groups are near-exact via linear counting") {
    // distinct count well below m: the small-range correction m*ln(m/V)
    // is near-exact (V = m - occupied buckets, no collisions expected)
    val df = (1 to 50).flatMap(i => Seq(("g", i), ("g", i))).toDF("grp", "k")
    val r = Sketches.hllDistinct(df, col("k"), Seq("grp"), m = 512).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("exact_distinct") == 50)
    val est = r.head.getAs[Double]("hll_estimate")
    assert(math.abs(est - 50) <= 3, s"estimate $est too far from 50")
  }

  test("hllDistinct: estimate within HLL error bounds at larger cardinality") {
    val df = (1 to 20000).map(i => ("g", i)).toDF("grp", "k")
    val r = Sketches.hllDistinct(df, col("k"), Seq("grp"), m = 512).collect()
    val est = r.head.getAs[Double]("hll_estimate")
    // standard error ~1.04/sqrt(512) = 4.6%; allow 4 sigma
    assert(math.abs(est - 20000) / 20000 < 0.19, s"estimate $est off >19%")
  }

  test("hllDistinct groups independently and is layout-invariant") {
    val df = ((1 to 100).map(i => ("a", i)) ++ (1 to 10).map(i => ("b", i)))
      .toDF("grp", "k")
    val run1 = Sketches.hllDistinct(df, col("k"), Seq("grp"), m = 512)
      .orderBy("grp").collect()
    assert(run1.map(_.getAs[Long]("exact_distinct")).toSeq == Seq(100L, 10L))
    val run2 = Sketches.hllDistinct(df.repartition(13), col("k"), Seq("grp"),
      m = 512).orderBy("grp").collect()
    assert(run1.toSeq == run2.toSeq) // register max is order-free
  }

  test("hll registers merge across shards: union-of-sketches == sketch-of-union") {
    // the mergeability contract that makes HLL the 100 TB incremental
    // sketch: shard the input arbitrarily, sketch each shard, max-merge
    // the registers — the estimate is IDENTICAL to sketching everything
    val df = (1 to 5000).map(i => ("g", i)).toDF("grp", "k")
    val whole = Sketches.hllEstimate(
      Sketches.hllRegisters(df, col("k"), Seq("grp")), Seq("grp"))
      .collect().head.getAs[Double]("hll_estimate")
    val shards = Seq(
      df.where($"k" % 3 === 0), df.where($"k" % 3 === 1),
      df.where($"k" % 3 === 2), df.where($"k" < 100)) // overlap is fine
      .map(s => Sketches.hllRegisters(s, col("k"), Seq("grp")))
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(shards, Seq("grp")), Seq("grp"))
      .collect().head.getAs[Double]("hll_estimate")
    assert(merged == whole)
  }

  test("hllDistinct rejects non-power-of-two m") {
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(Seq(("a", 1)).toDF("g", "k"), col("k"), Seq("g"), m = 300)
    }
  }

  test("cmsHeavy: estimates are exact when width dwarfs the key count") {
    // 5 keys into 256 cells x 4 rows: a collision would have to hit ALL
    // 4 rows to bias the min, so the estimates equal the true counts
    val df = (1 to 5).flatMap(k => Seq.fill(k * 10)(s"key$k")).toDF("k")
    val r = Sketches.cmsHeavy(df, col("k"), depth = 4, width = 256, topN = 5)
      .orderBy("key").collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getAs[Long]("cms_estimate") == row.getAs[Long]("exact_count"),
        s"collision-free sketch should be exact: $row")
    }
  }

  test("KMV shard merge equals the whole-corpus sketch") {
    import spark.implicits._
    val df = (1 to 3000).map(i => s"v${i % 997}").toDF("v")
    val whole = Sketches.kmvDistinct(df, col("v"), k = 64)
      .select("kmv_estimate").as[Double].head()
    val shards = (0 until 4).map(s =>
      Sketches.kmvSketch(df.where(expr(s"abs(hash(v)) % 4 = $s")),
        col("v"), k = 64))
    val merged = Sketches.kmvMergeEstimate(shards, k = 64)
      .as[Double].head()
    assert(merged == whole,
      s"merged shards must equal the one-shot sketch: $merged vs $whole")
    // merging with an empty shard changes nothing
    val withEmpty = Sketches.kmvMergeEstimate(
      shards :+ Sketches.kmvSketch(df.where(lit(false)), col("v"), 64), 64)
      .as[Double].head()
    assert(withEmpty == whole)
  }

  test("hllIntersectEstimate: inclusion-exclusion overlap, clamped at 0") {
    val a = (0 until 3000).map(i => ("g", s"id$i")).toDF("grp", "k")
    val b = (2000 until 5000).map(i => ("g", s"id$i")).toDF("grp", "k")
    val ra = Sketches.hllRegisters(a, col("k"), Seq("grp"))
    val rb = Sketches.hllRegisters(b, col("k"), Seq("grp"))
    val est = Sketches.hllIntersectEstimate(ra, rb, Seq("grp"))
      .select("hll_intersection").as[Double].head()
    // true overlap 1000; three stacked ~4.6%-RSE estimates of 3k/3k/5k
    assert(math.abs(est - 1000.0) < 400.0, s"overlap estimate $est")
    // near-disjoint inputs must clamp at >= 0, never go negative
    val c = (100000 until 103000).map(i => ("g", s"id$i")).toDF("grp", "k")
    val rc = Sketches.hllRegisters(c, col("k"), Seq("grp"))
    val est2 = Sketches.hllIntersectEstimate(ra, rc, Seq("grp"))
      .select("hll_intersection").as[Double].head()
    assert(est2 >= 0.0, s"clamp failed: $est2")
  }

  test("hllRolling: trailing window == sketch of the window's union; gaps empty") {
    // bucket b holds keys [b*50, b*50+100): consecutive buckets share 50
    val rows = (for (b <- 1L to 4L; k <- b * 50 until b * 50 + 100)
      yield (b, s"id$k")).toDF("day", "k")
    val out = Sketches.hllRolling(rows, col("day"), col("k"), window = 2)
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // the rolling estimate must EQUAL the one-shot sketch of the union
    // of the window's buckets (register max-merge is lossless)
    for (t <- 1L to 4L) {
      val direct = Sketches.hllEstimate(
        Sketches.hllRegisters(
          rows.where(col("day").between(t - 1, t)).withColumn("g", lit(1)),
          col("k"), Seq("g")), Seq("g"))
        .select("hll_estimate").as[Double].head()
      assert(out(t) == direct, s"bucket $t: ${out(t)} vs one-shot $direct")
    }
    // truth: bucket 1 sees 100 keys, buckets 2-4 see 150; linear-counting
    // regime is near-exact at these cardinalities
    assert(math.abs(out(1L) - 100.0) < 10.0 &&
      math.abs(out(3L) - 150.0) < 12.0, s"estimates drifted: $out")
    // calendar gaps count as EMPTY buckets, and absent buckets emit no row
    val gappy = rows.where(col("day").isin(1L, 3L))
    val g = Sketches.hllRolling(gappy, col("day"), col("k"), window = 2)
      .as[(Long, Double)].collect().toMap
    assert(g.keySet == Set(1L, 3L))
    // bucket 3's window {2,3} has no bucket-2 rows: estimate covers only
    // bucket 3's own 100 keys
    assert(math.abs(g(3L) - 100.0) < 10.0, s"gap window drifted: ${g(3L)}")
  }

  test("kmvJaccard: exact when k >= |union|, banded estimate below") {
    val a = (1 to 100).map(i => s"k$i").toDF("v")
    val b = (51 to 150).map(i => s"k$i").toDF("v")
    // |A∩B| = 50, |A∪B| = 150, true J = 1/3; k = 512 >= union -> exact
    val exact = Sketches.kmvJaccard(a, col("v"), b, col("v"), k = 512)
      .as[(Long, Long, Double)].head()
    assert(exact == ((150L, 50L, 0.333333)), s"exact regime: $exact")
    // small k: a coordinated sample — estimate lands in a wide band
    val est = Sketches.kmvJaccard(a, col("v"), b, col("v"), k = 32)
      .as[(Long, Long, Double)].head()
    assert(est._1 == 32L && est._3 > 0.05 && est._3 < 0.7,
      s"sampled regime: $est")
  }

  test("cmsHeavy never underestimates") {
    // 200 keys into a deliberately tiny 2x16 sketch: heavy collisions
    val df = (1 to 600).map(i => s"k${i % 200}").toDF("k")
    val r = Sketches.cmsHeavy(df, col("k"), depth = 2, width = 16, topN = 10)
      .collect()
    r.foreach { row =>
      assert(row.getAs[Long]("cms_estimate") >= row.getAs[Long]("exact_count"))
    }
  }

  test("cmsJoinSize: never underestimates, exact at collision-free width") {
    // a: keys 1..50 twice; b: keys 26..75 three times
    // true join size = |{26..50}| x 2 x 3 = 150
    val a = (1 to 50).flatMap(i => Seq(i, i)).toDF("k")
    val b = (26 to 75).flatMap(i => Seq(i, i, i)).toDF("k")
    val r = Sketches.cmsJoinSize(a, col("k"), b, col("k"),
      depth = 4, width = 4096).head()
    assert(r.getAs[Long]("exact_pairs") == 150L)
    // CMS inner product >= truth always (collision terms only add)
    assert(r.getAs[Long]("cms_estimate") >= 150L)
    // 100 keys into 4096 cells: near-collision-free. The fixed hash family
    // leaves exactly one surviving 2x3 collision term in the min row here
    // (156 = 150 + 2·3) — deterministic, and far inside the ε·Na·Nb bound.
    assert(r.getAs[Long]("cms_estimate") <= 165L,
      s"estimate should be near-exact, got ${r.getAs[Long]("cms_estimate")}")
    // disjoint keys: exact 0; the estimate may carry collision noise but
    // the sketch sizes here make it 0 too
    val c = (1000 to 1050).map(identity).toDF("k")
    val r0 = Sketches.cmsJoinSize(a, col("k"), c, col("k"),
      depth = 4, width = 4096).head()
    assert(r0.getAs[Long]("exact_pairs") == 0L)
  }

  test("kmvDifference: exact when the union fits in k") {
    val a = (1 to 100).toDF("v")
    val b = (51 to 150).toDF("v")
    val r = Sketches.kmvDifference(a, col("v"), b, col("v"), k = 1024)
      .head()
    // union 150 < k: estimate is exact; A-only = 1..50
    assert(r.getAs[Long]("n_union") == 150L)
    assert(r.getAs[Long]("n_only_a") == 50L)
    assert(r.getAs[Double]("kmv_union_estimate") == 150.0)
    assert(r.getAs[Double]("kmv_diff_estimate") == 50.0)
  }

  test("kmvDifference: estimate tracks the true difference at k << union") {
    val a = (1 to 4000).toDF("v")
    val b = (3001 to 6000).toDF("v")   // |A\B| = 3000, union 6000
    val r = Sketches.kmvDifference(a, col("v"), b, col("v"), k = 512)
      .head()
    val est = r.getAs[Double]("kmv_diff_estimate")
    assert(math.abs(est - 3000.0) / 3000.0 < 0.25,
      s"diff estimate $est too far from 3000")
    // disjoint B: everything in A is A-only
    val r2 = Sketches.kmvDifference(a, col("v"),
      (10000 to 10100).toDF("v"), col("v"), k = 256).head()
    assert(r2.getAs[Long]("n_only_a") > 200L)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val confirm = Map("confirm.truncate" -> "true")

  test("zValue interleaves bits (known Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
    // morton(5=101, 3=011) = y2x2 y1x1 y0x0 = 0 1 . 1 0 . 1 1 = 0b011011+16? compute:
    // bit0: x0=1 -> 1<<0; y0=1 -> 1<<1; bit1: x1=0; y1=1 -> 1<<3; bit2: x2=1 -> 1<<4
    // z = 1 + 2 + 8 + 16 = 27
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("zValue is monotone under block locality: close points share prefixes") {
    // 4x4 grid: the 2x2 quadrants of the z-curve are contiguous ranges
    val pts = for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong)
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val q00 = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).map(zs)
    val q11 = Seq((2L, 2L), (3L, 2L), (2L, 3L), (3L, 3L)).map(zs)
    assert(q00.max < q11.min) // whole quadrant sorts before the far one
    assert(q00.sorted == Seq(0L, 1L, 2L, 3L) && q11.sorted == Seq(12L, 13L, 14L, 15L))
  }

  test("zorderManifest blocks are tight in BOTH dimensions") {
    val n = 256 // 16x16 grid, one row per cell
    val df = (0 until n).map { i => (i.toLong, (i % 16).toLong, (i / 16).toLong) }
      .toDF("id", "x", "y")
    val man = Layout.zorderManifest(df, "x", "y", "id", blockSize = 16, bits = 4)
      .orderBy("block_id").collect()
    assert(man.map(_.getLong(1)).sum == n)
    // on the z-curve every 16-row block of a 16x16 grid is a 4x4 quadrant:
    // both dimension ranges span exactly 4 values — a linear sort by x
    // would leave the y range spanning all 16
    man.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) == 3, s"x range loose: $r")
      assert(r.getLong(5) - r.getLong(4) == 3, s"y range loose: $r")
    }
    graft.util.Caches.unpersistAll()
  }

  test("zorderWrite + prunedRead: directory-level skipping, identical results") {
    val n = 256 // 16x16 grid
    val df = (0 until n).map { i => (i.toLong, (i % 16).toLong, (i / 16).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      val manifest = Layout.zorderWrite(df, "x", "y", "id", dir,
        blockSize = 16, bits = 4, options = confirm)
      assert(manifest.count() == 16)
      val pruned = Layout.prunedRead(spark, dir, 0, 3, 0, 3)
      // correctness: identical to brute-force filtering the raw table
      val expected = df.where($"x" <= 3 && $"y" <= 3)
        .select("x", "y", "id").orderBy("id").collect()
      assert(pruned.orderBy("id").collect().toSeq == expected.toSeq)
      // skipping: the quadrant is ONE z-block; the scan's own metric
      // (inputFiles is filter-agnostic) must show one directory read
      import org.apache.spark.sql.execution.FileSourceScanExec
      def filesScanned(q: org.apache.spark.sql.DataFrame): Long = {
        val scans = q.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f }
        q.count() // drive the metric
        scans.map(_.metrics("numFiles").value).sum
      }
      val allFiles = spark.read.parquet(s"$dir/data").inputFiles.length
      val readFiles = filesScanned(pruned)
      assert(readFiles < allFiles, s"no pruning: $readFiles vs $allFiles")
      // the surviving blocks must reach the scan as a DYNAMIC partition
      // filter (the manifest semi-join broadcast), never as a collected
      // literal list — at 100 TB an isin of block ids is plan bloat
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("block_id"),
        s"block pruning not partition-level:\n$plan")
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"manifest semi-join did not become a dynamic partition filter:\n$plan")
      assert(!plan.contains("block_id IN"),
        s"collected literal block list found in plan:\n$plan")
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("prunedRead with a fully-missing range returns empty, not an error") {
    val df = (0 until 64).map { i => (i.toLong, (i % 8).toLong, (i / 8).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder2").toString
    try {
      Layout.zorderWrite(df, "x", "y", "id", dir, blockSize = 16, bits = 3,
        options = confirm)
      assert(Layout.prunedRead(spark, dir, 100, 200, 100, 200).isEmpty)
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("zorderWrite refuses to overwrite without the truncate latch") {
    val df = Seq((1L, 1L, 1L)).toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zlatch").toString
    try {
      val e = intercept[IllegalArgumentException] {
        Layout.zorderWrite(df, "x", "y", "id", dir, blockSize = 16, bits = 3)
      }
      assert(e.getMessage.contains("confirm.truncate"))
      // nothing was written before the latch fired
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "data")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("zValueN interleaves three bit-streams (known values)") {
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (5L, 3L, 6L))
      .toDF("x", "y", "w")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("w")), bits = 3).as("z"))
    // x=101, y=011, w=110; col j's bit b lands at 3b+j:
    // b0: x->1, y->2; b1: y->16, w->32; b2: x->64, w->256  => 371
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 4L, 371L))
  }

  test("zValueN with k=2 equals zValue bit-for-bit") {
    val pts = for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y)
    val diff = pts.toDF("x", "y")
      .where(Layout.zValue(col("x"), col("y"), 3) =!=
        Layout.zValueN(Seq(col("x"), col("y")), 3))
    assert(diff.isEmpty)
  }

  test("zorderManifestN blocks are tight in ALL THREE dimensions") {
    // 8x8x8 cube, one row per cell; 64-row z-blocks are 4x4x4 sub-cubes
    val df = (0 until 512).map { i =>
      (i.toLong, (i % 8).toLong, ((i / 8) % 8).toLong, (i / 64).toLong)
    }.toDF("id", "x", "y", "w")
    val man = Layout.zorderManifestN(df, Seq("x", "y", "w"), "id",
        blockSize = 64, bits = 3)
      .orderBy("block_id").collect()
    assert(man.map(_.getLong(1)).sum == 512)
    assert(man.length == 8)
    man.foreach { r =>
      // schema: block_id, n_rows, min_x, max_x, min_y, max_y, min_w, max_w
      assert(r.getLong(3) - r.getLong(2) == 3, s"x range loose: $r")
      assert(r.getLong(5) - r.getLong(4) == 3, s"y range loose: $r")
      assert(r.getLong(7) - r.getLong(6) == 3, s"w range loose: $r")
    }
    graft.util.Caches.unpersistAll()
  }

  test("3-D write + prunedReadN: identical to raw filter, partition-pruned") {
    val df = (0 until 512).map { i =>
      (i.toLong, (i % 8).toLong, ((i / 8) % 8).toLong, (i / 64).toLong)
    }.toDF("id", "x", "y", "w")
    val dir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    try {
      Layout.zorderWriteN(df, Seq("x", "y", "w"), "id", dir,
        blockSize = 64, bits = 3, options = confirm)
      val pruned = Layout.prunedReadN(spark, dir,
        Seq(("x", 0L, 3L), ("y", 0L, 3L), ("w", 0L, 3L)))
      val expected = df.where($"x" <= 3 && $"y" <= 3 && $"w" <= 3)
        .select("x", "y", "w", "id").orderBy("id").collect()
      assert(pruned.orderBy("id").collect().toSeq == expected.toSeq)
      assert(pruned.queryExecution.executedPlan.toString
        .toLowerCase.contains("dynamicpruning"))
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("zValue rejects out-of-range bits") {
    intercept[IllegalArgumentException] {
      Layout.zValue(lit(1L), lit(1L), bits = 0)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderManifest(Seq((1L, 1L, 1L)).toDF("id", "x", "y"),
        "x", "y", "id", blockSize = 0)
    }
  }

  test("hilbertValue: bijective on the grid, EVERY curve step is a unit move") {
    val bits = 3 // exhaustive 8x8 grid
    val n = 1 << bits
    val cells = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = cells.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits).as("d"))
      .as[(Long, Long, Long)].collect()
    // bijection onto [0, n^2)
    assert(d.map(_._3).sorted.toSeq == (0L until (n * n).toLong))
    // the Hilbert property Z-order lacks: consecutive positions are
    // ALWAYS Manhattan-adjacent cells — no bit-carry teleports
    val byD = d.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, d2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve step to d=$d2 jumps from ($x1,$y1) to ($x2,$y2)")
    }
    // domain contract: out-of-range inputs fold (mask), never corrupt
    val folded = Seq((n.toLong + 2, 3L), (2L, 3L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), bits).as("d"))
      .as[Long].collect()
    assert(folded(0) == folded(1))
  }

  test("hilbertWrite + prunedRead: identical to raw filter, skips >= Morton") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
        (col("l_orderkey") * 10000 + col("l_linenumber")).as("id"))
    val hDir = java.nio.file.Files.createTempDirectory("graft_hw_t").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft_zw_t").toString
    try {
      intercept[IllegalArgumentException] {
        Layout.hilbertWrite(li, "x", "y", "id", hDir, blockSize = 512)
      }
      Layout.hilbertWrite(li, "x", "y", "id", hDir, blockSize = 512,
        options = Map("confirm.truncate" -> "true"))
      Layout.zorderWrite(li, "x", "y", "id", zDir, blockSize = 512,
        options = Map("confirm.truncate" -> "true"))
      val (xLo, xHi, yLo, yHi) = (50L, 150L, 2L, 6L)
      val expected = li.where(col("x").between(xLo, xHi)
        && col("y").between(yLo, yHi)).orderBy("id", "x", "y").collect()
      val pruned = Layout.prunedRead(spark, hDir, xLo, xHi, yLo, yHi)
        .select("x", "y", "id").orderBy("id", "x", "y").collect()
      assert(pruned.toSeq == expected.map(r =>
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
      // pruning power: blocks whose min-max box intersects the query box —
      // Hilbert's tighter boxes must survive no more often than Morton's
      def surviving(dir: String): Long =
        spark.read.parquet(s"$dir/manifest")
          .where(col("min_x") <= xHi && col("max_x") >= xLo &&
            col("min_y") <= yHi && col("max_y") >= yLo).count()
      assert(surviving(hDir) <= surviving(zDir),
        s"hilbert survives ${surviving(hDir)} blocks vs zorder ${surviving(zDir)}")
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(hDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zDir))
    }
  }

  test("hilbertValueN: 3-D bijection and unit-step walk (Skilling)") {
    val bits = 2 // exhaustive 4x4x4 grid
    val n = 1 << bits
    val cells = (for { x <- 0 until n; y <- 0 until n; z <- 0 until n }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val d = cells.select(col("x"), col("y"), col("z"),
        Layout.hilbertValueN(Seq(col("x"), col("y"), col("z")), bits).as("d"))
      .as[(Long, Long, Long, Long)].collect()
    assert(d.map(_._4).sorted.toSeq == (0L until (n * n * n).toLong))
    // the defining Hilbert property holds in ANY dimension: consecutive
    // curve positions are Manhattan-adjacent cells
    val byD = d.sortBy(_._4)
    byD.sliding(2).foreach { case Array((x1, y1, z1, _), (x2, y2, z2, d2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"step to d=$d2 jumps from ($x1,$y1,$z1) to ($x2,$y2,$z2)")
    }
    // 2-D Skilling is also a valid Hilbert walk (unit steps), though a
    // different orientation than hilbertValue's xy2d variant
    val cells2 = (for { x <- 0 until 8; y <- 0 until 8 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val d2 = cells2.select(col("x"), col("y"),
        Layout.hilbertValueN(Seq(col("x"), col("y")), 3).as("d"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(d2.map(_._3).toSeq == (0L until 64L))
    d2.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
  }

  test("hilbertManifest: same carve as zorder, measurably tighter blocks") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
        (col("l_orderkey") * 10000 + col("l_linenumber")).as("id"))
    val h = Layout.hilbertManifest(li, "x", "y", "id", blockSize = 512,
      bits = 16).collect()
    val z = Layout.zorderManifest(li, "x", "y", "id", blockSize = 512,
      bits = 16).collect()
    def rows(m: Array[org.apache.spark.sql.Row]) =
      m.map(_.getAs[Long]("n_rows")).sum
    assert(rows(h) == rows(z)) // identical carve arithmetic, only the curve differs
    // mean min-max box area — the statistic that IS pruning power. Hilbert's
    // unit-step locality must not lose to Morton on real key distributions.
    def meanArea(m: Array[org.apache.spark.sql.Row]) =
      m.map(r => (r.getAs[Long]("max_x") - r.getAs[Long]("min_x") + 1).toDouble *
        (r.getAs[Long]("max_y") - r.getAs[Long]("min_y") + 1)).sum / m.length
    assert(meanArea(h) <= meanArea(z),
      s"hilbert mean block box ${meanArea(h)} vs zorder ${meanArea(z)}")
    graft.util.Caches.unpersistAll()
  }

  test("bloomAugment + bloomRead: exact point lookup, blocks skipped, latch") {
    val n = 256
    val df = (0 until n).map { i => (i.toLong, (i % 16).toLong, (i / 16).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    try {
      Layout.zorderWrite(df, "x", "y", "id", dir,
        blockSize = 16, bits = 4, options = confirm)
      // latch: refuses without confirm.truncate
      intercept[IllegalArgumentException] {
        Layout.bloomAugment(spark, dir, "id")
      }
      val blooms = Layout.bloomAugment(spark, dir, "id",
        mBits = 4096, k = 5, options = confirm)
      assert(blooms.select("block_id").distinct().count() == 16)
      // exact: identical to filtering the raw table, including a missing key
      val got = Layout.bloomRead(spark, dir, "id", Seq("7", "133", "9999"))
        .orderBy("id").collect().toSeq
      val want = df.where($"id".isin(7L, 133L))
        .select("x", "y", "id").orderBy("id")
        .collect().toSeq
      assert(got.map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
        == want.map(r => (r.getLong(2), r.getLong(0), r.getLong(1))))
      // skipping: with 4096 bits over 16 ids/block the two probe ids
      // survive in ~2 blocks, far fewer than the 16 data directories
      import org.apache.spark.sql.execution.FileSourceScanExec
      val q = Layout.bloomRead(spark, dir, "id", Seq("7"))
      val scans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.schema.fieldNames.contains("x") => f }
      q.count()
      val readFiles = scans.map(_.metrics("numFiles").value).sum
      val allFiles = spark.read.parquet(s"$dir/data").inputFiles.length
      assert(readFiles < allFiles,
        s"bloom did not skip blocks: $readFiles vs $allFiles")
      // the block list arrives via dynamic partition pruning, not a
      // collected literal
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"bloom semi-join did not become a dynamic partition filter:\n$plan")
      assert(!plan.contains("block_id IN"),
        s"collected literal block list found in plan:\n$plan")
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("bloom (m, k) ride the bits table atomically; mixed params refuse") {
    val df = (0 until 64).map { i => (i.toLong, (i % 8).toLong, (i / 8).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomk").toString
    try {
      Layout.zorderWrite(df, "x", "y", "id", dir,
        blockSize = 16, bits = 3, options = confirm)
      val blooms = Layout.bloomAugment(spark, dir, "id",
        mBits = 1024, k = 3, options = confirm)
      // parameters are columns of the SAME table as the bits — one
      // atomic overwrite publishes both (no separate meta table a
      // rebuild race could leave stale)
      assert(blooms.columns.toSet == Set("block_id", "w", "bits", "m", "k"))
      assert(blooms.select("m", "k").distinct().collect().toSeq
        .map(r => (r.getLong(0), r.getInt(1))) == Seq((1024L, 3)))
      assert(!new java.io.File(s"$dir/bloom_id_meta").exists,
        "no separate meta table may be written")
      // a table carrying two parameter sets is a corrupt publish: probing
      // it risks bloom false NEGATIVES, so the read must refuse
      blooms.withColumn("m", lit(2048L)).limit(1)
        .write.mode("append").parquet(s"$dir/bloom_id")
      val ex = intercept[IllegalArgumentException] {
        Layout.bloomRead(spark, dir, "id", Seq("7")).collect()
      }
      assert(ex.getMessage.contains("distinct"))
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("bloom legacy layout: pre-r13 dirs refuse with a rebuild message; " +
      "republish removes a stale _meta directory") {
    val df = (0 until 64).map { i => (i.toLong, (i % 8).toLong, (i / 8).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomleg").toString
    try {
      Layout.zorderWrite(df, "x", "y", "id", dir,
        blockSize = 16, bits = 3, options = confirm)
      val blooms = Layout.bloomAugment(spark, dir, "id",
        mBits = 1024, k = 3, options = confirm)
      // simulate a pre-r13 publish: bits without m/k columns plus the
      // old separate meta table (materialized driver-side first — the
      // rewrite targets the directory being read)
      val legacyRows = blooms
        .select(col("block_id").cast("long"), col("w").cast("long"),
          col("bits").cast("long"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      legacyRows.toDF("block_id", "w", "bits")
        .write.mode("overwrite").parquet(s"$dir/bloom_id")
      Seq((1024L, 3)).toDF("m", "k")
        .write.mode("overwrite").parquet(s"$dir/bloom_id_meta")
      val ex = intercept[IllegalStateException] {
        Layout.bloomRead(spark, dir, "id", Seq("7")).collect()
      }
      assert(ex.getMessage.contains("legacy")
        && ex.getMessage.contains("bloomAugment"), ex.getMessage)
      // the prescribed fix — republishing — must also clean up the
      // orphaned meta directory
      Layout.bloomAugment(spark, dir, "id", mBits = 1024, k = 3,
        options = confirm)
      assert(!new java.io.File(s"$dir/bloom_id_meta").exists,
        "republish must delete the legacy meta directory")
      assert(Layout.bloomRead(spark, dir, "id", Seq("7"))
        .select("id").as[Long].collect().toSeq == Seq(7L))
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  /** (relative path -> md5) of every data file under `dir`/data. */
  private def dataFileState(dir: String): Map[String, String] = {
    val base = java.nio.file.Paths.get(dir, "data")
    val out = scala.collection.mutable.Map.empty[String, String]
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)
          && !p.getFileName.toString.startsWith(".")
          && !p.getFileName.toString.startsWith("_")) {
        val md = java.security.MessageDigest.getInstance("MD5")
        out(base.relativize(p).toString) =
          md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
      }
    }
    out.toMap
  }

  test("targetedDelete: deleted ids gone, survivors intact, UNTOUCHED " +
      "blocks byte-identical, bloom and manifest stay consistent; latch") {
    val n = 256
    val df = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i / 16).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel").toString
    try {
      Layout.zorderWrite(df, "x", "y", "id", dir,
        blockSize = 16, bits = 4, options = confirm)
      Layout.bloomAugment(spark, dir, "id", mBits = 4096, k = 5,
        options = confirm)
      intercept[IllegalArgumentException] {
        Layout.targetedDelete(spark, dir, "id", Seq(7L))
      }
      val touchedBlocks = spark.read.parquet(s"$dir/data")
        .where($"id".isin(7L, 8L)).select("block_id")
        .distinct().collect().map(_.get(0).toString.toLong).toSet
      val before = dataFileState(dir)
      val summary = Layout.targetedDelete(spark, dir, "id",
        Seq(7L, 8L, 999999L), Map("confirm.delete" -> "true"))
        .collect().head
      assert(summary.getAs[Long]("n_rows_deleted") == 2L)
      assert(summary.getAs[Long]("n_blocks") == 16L)
      // with 4096-bit blooms over 16 ids/block the candidate set is the
      // hit blocks (maybe + rare FPs), nowhere near all 16
      assert(summary.getAs[Long]("n_candidate_blocks") < 16L)
      assert(summary.getAs[Long]("n_emptied_blocks") == 0L)
      // the store reads exactly like the raw table minus the ids
      val got = spark.read.parquet(s"$dir/data")
        .select("x", "y", "id").orderBy("id").collect().toSeq
      val want = df.where(!$"id".isin(7L, 8L))
        .select("x", "y", "id").orderBy("id").collect().toSeq
      assert(got.map(_.toString) == want.map(_.toString))
      // byte-identity: every file outside the hit blocks is unchanged
      val after = dataFileState(dir)
      def outside(m: Map[String, String]) = m.filterNot { case (p, _) =>
        touchedBlocks.exists(b => p.startsWith(s"block_id=$b/")) }
      assert(outside(before) == outside(after),
        "untouched block files were rewritten")
      assert(before.keySet.exists(p =>
        touchedBlocks.exists(b => p.startsWith(s"block_id=$b/"))))
      // derived stores: bloom finds survivors, never the deleted ids
      assert(Layout.bloomRead(spark, dir, "id", Seq("7", "8"))
        .count() == 0L)
      assert(Layout.bloomRead(spark, dir, "id", Seq("9"))
        .select("id").as[Long].collect().toSeq == Seq(9L))
      // manifest row counts re-sum to the surviving total
      val manifestN = spark.read.parquet(s"$dir/manifest")
        .agg(sum("n_rows")).collect().head.getLong(0)
      assert(manifestN == (n - 2).toLong)
      // pruned range reads stay exact over the rewritten store
      val pr = Layout.prunedRead(spark, dir, 0L, 15L, 0L, 0L)
        .orderBy("id").select("id").as[Long].collect().toSeq
      assert(pr == (0 until 16).map(_.toLong).filterNot(Set(7L, 8L)))
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("targetedDelete: a fully-deleted block disappears from data, " +
      "manifest, and bloom; statistics-free layouts warn and full-scan") {
    val n = 128
    val df = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i / 16).toLong) }
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel2").toString
    try {
      Layout.zorderWrite(df, "x", "y", "id", dir,
        blockSize = 16, bits = 4, options = confirm)
      Layout.bloomAugment(spark, dir, "id", mBits = 4096, k = 5,
        options = confirm)
      // whatever ids landed in block 3: delete them all
      val block3 = spark.read.parquet(s"$dir/data")
        .where(col("block_id") === 3).select("id").as[Long]
        .collect().toSeq
      assert(block3.size == 16)
      val summary = Layout.targetedDelete(spark, dir, "id", block3,
        Map("confirm.delete" -> "true")).collect().head
      assert(summary.getAs[Long]("n_rows_deleted") == 16L)
      assert(summary.getAs[Long]("n_emptied_blocks") == 1L)
      assert(!new java.io.File(s"$dir/data/block_id=3").exists)
      assert(spark.read.parquet(s"$dir/manifest")
        .where(col("block_id") === 3).count() == 0L)
      assert(spark.read.parquet(s"$dir/bloom_id")
        .where(col("block_id") === 3).count() == 0L)
      assert(spark.read.parquet(s"$dir/data").count() == (n - 16).toLong)
      // no statistics tier for the key: loud full-candidate path still
      // deletes correctly (fresh layout, no bloom, key not in manifest)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_tdel3")
        .toString
      try {
        Layout.zorderWrite(df, "x", "y", "id", dir2,
          blockSize = 16, bits = 4, options = confirm)
        val s2 = Layout.targetedDelete(spark, dir2, "id", Seq(5L),
          Map("confirm.delete" -> "true")).collect().head
        assert(s2.getAs[Long]("n_candidate_blocks") == 8L) // all blocks
        assert(s2.getAs[Long]("n_rows_deleted") == 1L)
        assert(spark.read.parquet(s"$dir2/data")
          .where($"id" === 5L).count() == 0L)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir2))
      }
    } finally {
      graft.util.Caches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

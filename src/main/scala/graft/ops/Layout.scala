package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-ordering).
  *
  * A 100 TB table is pruned, not scanned: engines skip whole files/row
  * groups whose min-max ranges exclude the predicate. A single-column
  * sort gives perfect ranges on one key and useless ones on every other;
  * interleaving the bits of two keys (the Morton / Z-order curve, Morton
  * 1966 — the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`)
  * makes rows close in EITHER key land in the same blocks, so min-max
  * pruning works for both. This operator computes the curve position,
  * range-sorts by it (Spark's global sort = one range-partitioned
  * shuffle, no driver involvement), carves blocks of `blockSize` rows,
  * and emits the per-block min-max manifest — exactly the statistics a
  * scan planner consults, so the manifest doubles as a direct measure of
  * pruning power (tight, non-overlapping ranges in BOTH dimensions).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE
    * integer columns: x's bit b lands at position 2b, y's at 2b+1.
    * A pure 2·`bits`-term integer expression — codegen'd, narrow, and
    * replayable verbatim in any SQL engine (no loops, no UDF).
    *
    * Domain contract: callers map keys into [0, 2^bits) first (`pmod`,
    * bucketing, or epoch-offsetting a timestamp). Values outside still
    * produce deterministic z-values (both engines shift/mask longs
    * identically), but high bits are silently IGNORED, so two far-apart
    * keys can collide onto one curve position and the min-max manifest
    * loses its pruning tightness — the layout degrades, never corrupts.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { b =>
      val xbit = shiftleft(shiftright(xs, b).bitwiseAND(1L), 2 * b)
      val ybit = shiftleft(shiftright(ys, b).bitwiseAND(1L), 2 * b + 1)
      (xbit + ybit): Column
    }.reduce(_ + _)
  }

  /** Z-order `df` by (`xCol`, `yCol`) and return the block manifest:
    * one row per `blockSize`-row block with n_rows and min/max of both
    * dimensions. `idCol` breaks z-value ties so the layout is total and
    * reproducible.
    *
    * Plan shape: one narrow projection (the z expression), ONE
    * range-partitioned sort shuffle (`repartitionByRange` +
    * `sortWithinPartitions` — Spark's global sort, no driver
    * involvement), then global row positions via per-partition count
    * offsets (one count per PARTITION to the driver — the
    * [[Sampling.shardByBudget]] pattern, bounded by partition count,
    * never data size), then a block-keyed aggregation. At production
    * scale the sorted writer emits the data files and this manifest
    * becomes the skipping index a scan planner consults.
    */
  def zorderManifest(df: DataFrame, xCol: String, yCol: String,
      idCol: String, blockSize: Long, bits: Int = 16): DataFrame =
    blockAssigned(df, xCol, yCol, idCol, blockSize, bits)
      .groupBy("block_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))

  /** (block_id, x, y, id) for every input row under the Z-order layout —
    * shared by the manifest aggregation and the partitioned writer.
    */
  private def blockAssigned(df: DataFrame, xCol: String, yCol: String,
      idCol: String, blockSize: Long, bits: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val spark = df.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    // persisted: the offset pass and the assignment pass must read the
    // SAME materialized partitions (range boundaries are sampled)
    val sorted = graft.util.Caches.persist(
      df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
          col(idCol).cast("long").as("id"))
        .withColumn("z", zValue(col("x"), col("y"), bits))
        .repartitionByRange(n, col("z"), col("id"))
        .sortWithinPartitions("z", "id"))
    val nParts = sorted.rdd.getNumPartitions
    val counts: Array[(Int, Long)] = sorted
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        Iterator.single((pid, rows.size.toLong))
      }
      .collect()
    val offsets = new Array[Long](nParts)
    counts.foreach { case (pid, c) => if (pid + 1 < nParts) offsets(pid + 1) = c }
    for (i <- 1 until nParts) offsets(i) += offsets(i - 1)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    sorted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var rn = bOffsets.value(pid)
      rows.map { r =>
        val block = rn / blockSize
        rn += 1
        (block, r.getLong(0), r.getLong(1), r.getLong(2))
      }
    }.toDF("block_id", "x", "y", "id")
  }

  /** Materialize the Z-order layout as a SKIPPING INDEX: the data lands
    * under `outDir/data` partitioned by block_id (so a block predicate is
    * a directory-level PartitionFilter — zero footer reads for pruned
    * blocks), and the per-block min-max manifest lands under
    * `outDir/manifest`. Returns the manifest.
    *
    * This is the mechanic behind Delta/Iceberg `OPTIMIZE ZORDER BY` +
    * data skipping, expressed with plain parquet: at 100 TB the manifest
    * is rows/blockSize tiny rows, and [[prunedRead]] consults it instead
    * of the data.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, idCol: String,
      outDir: String, blockSize: Long, bits: Int = 16): DataFrame = {
    val assigned = blockAssigned(df, xCol, yCol, idCol, blockSize, bits)
    assigned.write.partitionBy("block_id").mode("overwrite")
      .parquet(s"$outDir/data")
    val manifest = assigned.groupBy("block_id")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    df.sparkSession.read.parquet(s"$outDir/manifest")
  }

  /** Range query over a [[zorderWrite]] layout, manifest-pruned: blocks
    * whose min-max rectangle misses [xLo,xHi]×[yLo,yHi] are skipped at
    * the DIRECTORY level (an `isin` over block_id becomes a
    * PartitionFilter), the row-level range predicate then runs only
    * inside surviving blocks.
    *
    * Driver footprint: the surviving block-id LIST (manifest rows, never
    * data). Because min-max pruning is conservative, the result is
    * IDENTICAL to filtering the raw table — the gate asserts exactly
    * that equivalence.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, outDir: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    require(xLo <= xHi && yLo <= yHi, "empty range")
    val keep = spark.read.parquet(s"$outDir/manifest")
      .where(col("min_x") <= xHi && col("max_x") >= xLo &&
        col("min_y") <= yHi && col("max_y") >= yLo)
      .select("block_id").collect().map(_.getLong(0))
    spark.read.parquet(s"$outDir/data")
      .where(col("block_id").isin(keep.map(Long.box): _*))
      .where(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
      .select("x", "y", "id")
  }
}

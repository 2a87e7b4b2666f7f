package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lakehouse table maintenance.
  *
  * The small-files problem is the silent killer of 100 TB parquet lakes:
  * every incremental append leaves another sliver file, and a table that
  * should scan as a few thousand row-group-sized splits degrades into
  * millions of open()/footer-parse round trips (plus NameNode/listing
  * pressure) that no amount of executor parallelism buys back. Compaction
  * rewrites a directory into ~`targetBytes` output files and is designed
  * to run as a background stage between pipeline runs.
  */
object Maintenance {

  /** (path, bytes) of every data file under `dir` (recursive, dotfiles
    * and _SUCCESS markers excluded). Driver-side listing — file METADATA
    * only, never data; at extreme directory counts swap in a distributed
    * lister, the compaction plan below is unchanged.
    */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith("."))
          buf += ((f.getPath.toString, f.getLen))
      }
      buf.result()
    }
  }

  /** Compact the parquet directory `inDir` into `outDir` targeting
    * `targetBytes` per output file; returns (DataFrame over the compacted
    * copy, output file count).
    *
    * The file count is ceil(total input bytes / targetBytes) — computed
    * from the actual listing, not row counts, so compression ratio and
    * wide/narrow schemas are automatically accounted for. The rewrite
    * uses `coalesce` (a NARROW dependency: input splits are merged into
    * output tasks with no shuffle, no sort, no hash — the cheapest
    * possible rewrite) unless the input already has fewer partitions
    * than requested, where it falls back to a round-robin repartition to
    * actually split oversized files.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (DataFrame, Int) = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val files = dataFiles(spark, inDir)
    require(files.nonEmpty, s"no data files under $inDir")
    val totalBytes = files.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val in = spark.read.parquet(inDir)
    val shaped =
      if (in.rdd.getNumPartitions >= nOut) in.coalesce(nOut)
      else in.repartition(nOut)
    shaped.write.mode("overwrite").parquet(outDir)
    (spark.read.parquet(outDir), dataFiles(spark, outDir).size)
  }

  /** Mergeable per-key aggregate state — the incremental-materialized-
    * view primitive: each ingest shard aggregates once into a compact
    * state table (`n` + one exact DECIMAL(38,6) sum per value column),
    * and [[mergeAggStates]] combines any number of shard states into
    * the state of their union WITHOUT rescanning rows. The contract
    * mirrors the sketch shard-merge gates (`sketch_hll_shards`,
    * `sketch_kmv_shards`), but for exact algebraic aggregates: count and
    * sum are associative, so merge(state(A), state(B)) == state(A ∪ B)
    * bit-for-bit. The decimal accumulator keeps the sum exact and
    * order-insensitive — a double sum would break both the merge
    * contract and the cross-engine replay.
    *
    * Shape at scale: state build is one map-side-combined aggregation
    * per shard; merge shuffles STATES (one row per key per shard), never
    * data — refreshing a 100 TB view after an append costs the append's
    * scan plus a state-sized merge.
    */
  def aggState(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "aggState needs at least one key column")
    require(sumCols.nonEmpty, "aggState needs at least one value column")
    import org.apache.spark.sql.functions._
    val aggs = count(lit(1)).as("n") +: sumCols.map(c =>
      sum(col(c).cast("decimal(38,6)")).as(s"sum_$c"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge shard states built by [[aggState]] over the SAME keys and
    * value columns: per-key long/decimal sums of the partials. Keys
    * present in any shard appear in the merge (a shard that never saw a
    * key simply contributes nothing).
    */
  def mergeAggStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAggStates needs at least one state")
    import org.apache.spark.sql.functions._
    val all = states.reduce(_ unionByName _)
    val valCols = all.columns.filterNot(keys.contains)
    require(valCols.contains("n"),
      s"not an aggState table: missing 'n' in ${all.columns.mkString(",")}")
    val aggs = valCols.map(c => sum(col(c)).as(c))
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

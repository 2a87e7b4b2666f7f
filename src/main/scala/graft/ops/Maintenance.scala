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
}

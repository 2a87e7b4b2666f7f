package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary round-20 debug probe; removed before round end
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val skewed = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.where(col("doc_id") % 40 === 0 &&
          size(split(col("text"), " ")) >= 40)
        .select((col("doc_id") + 100000L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("text")))
    for (_ <- 1 to args.drop(1).headOption.map(_.toInt).getOrElse(2)) {
      graft.util.Caches.unpersistAll()
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.containmentPairsStratified(
        skewed, "doc_id", "text", 128, threshold = 0.7).count()
      println(f"[skp] rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary round-20 debug probe; removed before round end
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      
    for (v <- args.drop(1)) {
      graft.util.Caches.unpersistAll()
      val t0 = System.nanoTime()
      v match {
        case "pairs" =>
          val n = graft.ops.Similarity
            .nearDupPairs(embs, 0.2, maxBucket = 16).count()
          println(f"[dbp] pairs rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        case "phases" =>
          graft.util.Fixpoint.withoutAqe(spark) {
            val pairs = graft.util.Caches.persist(
              graft.ops.Similarity.nearDupPairs(embs, 0.2, maxBucket = 16)
                .select(col("vec_a"), col("vec_b")))
            val t1 = System.nanoTime()
            val np = pairs.count()
            val t2 = System.nanoTime()
            val sym = pairs.union(
              pairs.select(col("vec_b").as("vec_a"), col("vec_a").as("vec_b")))
            val core = sym.groupBy(col("vec_a").as("vec_id"))
              .agg(count(lit(1)).as("__deg"))
              .where(col("__deg") + 1 >= 4).select("vec_id")
            val coreEdges = sym
              .join(core.select(col("vec_id").as("vec_a")), "vec_a")
              .join(core.select(col("vec_id").as("vec_b")), "vec_b")
              .where(col("vec_a") < col("vec_b"))
              .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
            val cc = graft.ops.Dedup.connectedComponents(coreEdges)
            val nc = cc.count()
            val t3 = System.nanoTime()
            println(f"[dbp] phases pairs=${(t2 - t1) / 1e9}%.2f s " +
              f"(n=$np) cc=${(t3 - t2) / 1e9}%.2f s (n=$nc) " +
              f"prelude=${(t1 - t0) / 1e9}%.2f s")
          }
        case "full" =>
          val out = graft.ops.Similarity.dbscan(embs, 0.2, 4, maxBucket = 16)
          val t1 = System.nanoTime()
          val n = out.count()
          println(f"[dbp] full rows=$n build=${(t1 - t0) / 1e9}%.2f s " +
            f"count=${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

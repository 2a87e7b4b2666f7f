package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary round-20 debug probe; removed before round end
object SccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val fwd = j.where(col("l_quantity") >= 49)
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst")).distinct()
    val bwd = j.where(col("l_quantity") <= 2)
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
    val edges = fwd.unionAll(bwd)
    for (v <- args.drop(1)) {
      graft.util.Caches.unpersistAll()
      val t0 = System.nanoTime()
      v match {
        case "scc" =>
          val n = graft.ops.Graph.scc(edges).count()
          println(f"[sccprobe] scc rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        case "topo" =>
          val out = graft.ops.Graph.topoLayers(edges)
          val t1 = System.nanoTime()
          val n = out.count()
          println(f"[sccprobe] topo rows=$n build=${(t1 - t0) / 1e9}%.2f s " +
            f"count=${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

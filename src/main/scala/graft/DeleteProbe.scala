package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Layout

// temporary round-20 debug probe; removed before round end
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    for (_ <- 1 to reps) {
      graft.util.Caches.unpersistAll()
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
          (col("l_orderkey") * 10000 + col("l_linenumber")).as("id"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_zdel_probe")
      val t0 = System.nanoTime()
      Layout.zorderWrite(li, "x", "y", "id", tmp.toString,
        blockSize = 4096L, bits = 16,
        options = Map("confirm.truncate" -> "true"))
      val t1 = System.nanoTime()
      Layout.bloomAugment(spark, tmp.toString, "id",
        mBits = 1 << 16, k = 5,
        options = Map("confirm.truncate" -> "true"))
      val t2 = System.nanoTime()
      val ids = spark.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_linenumber") === 1 && col("l_orderkey") % 97 === 0)
        .select((col("l_orderkey") * 10000 + col("l_linenumber")).as("id"))
        .distinct().collect().map(_.getLong(0)).toSeq.sorted
      val t3 = System.nanoTime()
      Layout.targetedDelete(spark, tmp.toString, "id", ids,
        options = Map("confirm.delete" -> "true"))
      val t4 = System.nanoTime()
      val n = spark.read.parquet(s"${tmp.toString}/data")
        .select(col("x"), col("y"), col("id"))
        .orderBy("id", "x", "y").count()
      val t5 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      println(s"[delp] rows=$n zwrite=${s(t0, t1)} bloom=${s(t1, t2)} " +
        s"ids=${s(t2, t3)} delete=${s(t3, t4)} readback=${s(t4, t5)}")
    }
    spark.stop()
  }
}

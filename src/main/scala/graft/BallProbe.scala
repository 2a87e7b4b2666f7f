package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: component timing for graph_ball (temporary). */
object BallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ball] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (_ <- 1 to 2) {
      graft.util.Caches.unpersistAll(); spark.catalog.clearCache()
      val li = t("read+filter") {
        val d = spark.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_orderkey") % 10 === 0)
        d.count(); d
      }
      val edges = t("coOccurrenceEdges") {
        val e = graft.util.Caches.persist(
          graft.ops.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey",
            maxGroup = 64))
        e.count(); e
      }
      val sym = t("sym") {
        val s = graft.util.Caches.persist(
          edges.select(col("a"), col("b"))
            .union(edges.select(col("b").as("a"), col("a").as("b"))))
        s.count(); s
      }
      val nodes = sym.select(col("a").as("node")).distinct()
      val members1 = nodes.select(col("node"), col("node").as("__member"))
        .unionAll(sym.select(col("a").as("node"), col("b").as("__member")))
      val regs1 = t("hll seed B1") {
        val r = graft.util.Caches.persist(
          graft.functions.Sketches.hllRegisters(
            members1, col("__member"), Seq("node"), 512))
        r.count(); r
      }
      val regs2 = t("hll round 2") {
        val contrib = sym.join(regs1.withColumnRenamed("node", "b"), "b")
          .select(col("a").as("node"), col("__b"), col("__m"))
        val next = regs1.unionAll(contrib)
          .groupBy("node", "__b").agg(max("__m").as("__m"))
        next.count(); next
      }
      t("estimate") {
        graft.functions.Sketches.hllEstimate(regs2, Seq("node"), 512).count()
      }
      val reach1 = t("exact seed B1") {
        val r = graft.util.Caches.persist(
          nodes.select(col("node").as("start"), col("node").as("x"))
            .unionAll(sym.select(col("a").as("start"), col("b").as("x"))))
        r.count(); r
      }
      t("exact round 2 + count") {
        reach1.unionAll(
            reach1.join(sym.select(col("a").as("x"), col("b").as("__nx")),
              "x").select(col("start"), col("__nx").as("x")))
          .distinct()
          .groupBy(col("start")).agg(count(lit(1))).count()
      }
      println("[ball] ---- pass done ----")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump physical plans of representative queries for the
  * scale/shuffle audit (pushdown reaching the scan, broadcast vs shuffle
  * joins, no cartesian products on the dedup/similarity paths).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet
      else Set("extract_lineitem", "join_agg", "sqltransform_agg",
        "dedup_minhash_pairs", "similarity_topk", "similarity_ann", "window_topn")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // opt-in: also dump the per-round frames of iterative operators
    // (graft.util.PlanDump hooks) into this directory
    sys.env.get("SPARK_GRAFT_PLAN_DUMP_DIR")
      .foreach(d => spark.conf.set("spark.graft.planDumpDir", d))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        println(s"\n========== $name ==========")
        val out = fn(spark, dir)
        out.explain("formatted")
        // iterative operators only build their internal frames when an
        // action runs; a noop write triggers them without output cost
        if (sys.env.contains("SPARK_GRAFT_PLAN_DUMP_DIR"))
          out.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

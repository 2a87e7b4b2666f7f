package graft.connect

import graft.SparkSpec
import graft.pipeline.PipelineContext
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The point of the bucketed layout: a join on the bucket key runs with NO
  * exchange on either side — the shuffle the layout pre-paid at write time.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables sort-merge-join without any exchange") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bktspec").toString
    val conn = new ParquetConnector(tmp)
    val facts = (1L to 1000L).map(i => (i % 100, s"f$i")).toDF("k", "fv")
    val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "dv")
    conn.write(facts, "facts", SaveMode.Overwrite,
      Map("confirm.truncate" -> "true", "bucket.by" -> "k", "bucket.n" -> "4"))
    conn.write(dims, "dims", SaveMode.Overwrite,
      Map("confirm.truncate" -> "true", "bucket.by" -> "k", "bucket.n" -> "4"))
    val f = conn.read("facts", Map("bucket.table" -> "true"))
    val d = conn.read("dims", Map("bucket.table" -> "true"))
    // force sort-merge (tiny tables would broadcast, hiding the property)
    val joined = f.hint("merge").join(d, Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() == 1000L)
  }

  test("bucketed write honors the destructive-write latch and round-trips") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bktlatch").toString
    val conn = new ParquetConnector(tmp)
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      conn.write(df, "t", SaveMode.Overwrite,
        Map("bucket.by" -> "k", "bucket.n" -> "2"))
    }
    conn.write(df, "t", SaveMode.Overwrite,
      Map("confirm.truncate" -> "true", "bucket.by" -> "k", "bucket.n" -> "2"))
    val back = conn.read("t", Map("bucket.table" -> "true"))
    assert(back.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // data lives under the connector's base dir, not the global warehouse
    assert(new java.io.File(s"$tmp/t.bucketed").exists())
  }
}

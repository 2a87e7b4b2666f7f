package graft.ops

import java.nio.file.Files
import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compact merges sliver files without changing a row") {
    val tmp = Files.createTempDirectory("m_compact").toString
    val src = (1L to 5000L).map(i => (i, s"payload_$i")).toDF("id", "v")
    src.repartition(40).write.parquet(s"$tmp/small")
    val before = Maintenance.dataFiles(spark, s"$tmp/small").size
    assert(before == 40)
    val (back, nOut) = Maintenance.compact(spark, s"$tmp/small",
      s"$tmp/out", targetBytes = 1L << 26)
    assert(nOut < before, s"expected fewer files, got $nOut of $before")
    assert(Maintenance.dataFiles(spark, s"$tmp/out").size == nOut)
    assert(datasetEquality(src, back))
  }

  test("output file count tracks ceil(bytes / targetBytes)") {
    val tmp = Files.createTempDirectory("m_target").toString
    (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(16).write.parquet(s"$tmp/small")
    val total = Maintenance.dataFiles(spark, s"$tmp/small").map(_._2).sum
    val target = total / 3
    val (_, nOut) = Maintenance.compact(spark, s"$tmp/small",
      s"$tmp/out", targetBytes = target)
    assert(nOut == ((total + target - 1) / target).toInt)
  }

  test("dataFiles skips markers and dotfiles; compact rejects empty dirs") {
    val tmp = Files.createTempDirectory("m_files").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$tmp/t")
    val files = Maintenance.dataFiles(spark, s"$tmp/t")
    assert(files.nonEmpty && files.forall { case (p, _) =>
      !p.contains("_SUCCESS") })
    assert(Maintenance.dataFiles(spark, s"$tmp/absent").isEmpty)
    intercept[IllegalArgumentException] {
      Maintenance.compact(spark, s"$tmp/absent", s"$tmp/out")
    }
  }

  test("aggState merge == direct aggregate of the union, bit-for-bit") {
    val df = Seq(
      ("a", 1.25), ("a", 2.50), ("b", 0.10), ("b", -0.10), ("c", 7.77)
    ).toDF("k", "v")
    val s1 = Maintenance.aggState(df.where($"v" >= 0.1), Seq("k"), Seq("v"))
    val s2 = Maintenance.aggState(df.where($"v" < 0.1), Seq("k"), Seq("v"))
    val merged = Maintenance.mergeAggStates(Seq(s1, s2), Seq("k"))
      .orderBy("k").collect()
    val direct = Maintenance.aggState(df, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("aggState: empty shard is the merge identity; schema is validated") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val s = Maintenance.aggState(df, Seq("k"), Seq("v"))
    val empty = Maintenance.aggState(df.where($"v" < 0), Seq("k"), Seq("v"))
    val merged = Maintenance.mergeAggStates(Seq(s, empty), Seq("k")).collect()
    assert(merged.toSeq == s.collect().toSeq)
    intercept[IllegalArgumentException] {
      Maintenance.mergeAggStates(Seq(df), Seq("k")) // not a state table
    }
  }
}

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
}

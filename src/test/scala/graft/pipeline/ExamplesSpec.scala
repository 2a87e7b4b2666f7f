package graft.pipeline

import graft.SparkSpec
import graft.connect.ParquetConnector

/** The shipped example configs must PARSE and RUN — a worked example
  * that rots is worse than none (the reference's arc.json is exercised
  * by its integration suite; this is the equivalent).
  */
class ExamplesSpec extends SparkSpec {

  test("examples/curate.conf parses, runs end to end at gate scale, and " +
      "publishes the curated slice") {
    implicit val ctx: PipelineContext = PipelineContext(spark)
    val conf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/curate.conf")),
      java.nio.charset.StandardCharsets.UTF_8)
    val sink = java.nio.file.Files
      .createTempDirectory("graft_example_sink").toString
    val conns = Map(
      "source" -> new ParquetConnector(sf001),
      "sink" -> new ParquetConnector(sink))
    val p = Parser.parse(conf, conns) match {
      case Left(errs) => fail(s"example config failed to parse: $errs")
      case Right(p) => p
    }
    // every stage participates in the default environment
    assert(p.stages.size == 9)
    Runner.run(p)
    val out = spark.read.parquet(s"$sink/curated_documents.parquet")
    assert(out.count() > 0, "the curated slice is non-empty")
    assert(out.columns.contains("score") && out.columns.contains("lang"))
    // the chain's semantics are pinned elsewhere (curate_pretrain /
    // stage_curate_pretrain hash-match); here: the publish really is the
    // kept view
    assert(out.count() == spark.table("kept").count())
    graft.util.Caches.unpersistAll()
  }
}

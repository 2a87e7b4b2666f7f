package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contract line must fit the consumer's bounded stdout tail
  * window (~2 KB) for ANY query-set size — rounds 5-6 broke the parse by
  * outgrowing it, and by round 8 the 94-name set no longer fits even at
  * 1-decimal precision, so [[Bench.compactContract]] now degrades to a
  * slowest-K subset plus an `"omitted"` count. These tests pin that the
  * line stays within budget by construction and never drops the keys the
  * consumer parses (`value`, `errors`, `sf`).
  */
class BenchContractSpec extends AnyFunSuite {

  private def parseable(line: String): Unit = {
    // cheap structural checks without a JSON lib on the test classpath
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith("}"))
    assert(line.contains(""","unit":"sec","queries":{"""))
    assert(line.contains(""","errors":{"""))
    assert(line.contains(""","sf":"""))
  }

  test("small query set keeps the full map at 3 decimals") {
    val mins = Seq("q1_agg" -> 0.123456, "q2_join" -> 1.5)
    val line = Bench.compactContract(1.623456, mins, "{}", "/root/testdata/sf0.1")
    parseable(line)
    assert(line.contains(""""q1_agg":0.123"""))
    assert(line.contains(""""q2_join":1.5"""))
    assert(!line.contains("omitted"))
  }

  test("round-8-sized set (94+ long names) fits the budget with omitted count") {
    val mins = (1 to 110).map(i => f"dedup_minhash_component_$i%03d" -> (i / 100.0))
    val line = Bench.compactContract(mins.map(_._2).sum, mins, "{}", "/root/testdata/sf0.1")
    parseable(line)
    assert(line.length <= 1890, s"line is ${line.length} chars")
    assert(line.contains(""","omitted":"""))
    // the slowest query must survive the cut
    assert(line.contains("dedup_minhash_component_110"))
  }

  test("a failed query (-1 sentinel) is never dropped from a truncated map") {
    val mins = (1 to 110).map(i => f"quality_metric_number_$i%03d" -> (i / 10.0)) :+
      ("broken_query" -> -1.0)
    val line = Bench.compactContract(0.0, mins, """{"broken_query":"boom"}""",
      "/root/testdata/sf0.1")
    assert(line.length <= 1890)
    assert(line.contains(""""broken_query":-1"""))
  }

  test("budget holds across the full range of set sizes") {
    for (n <- Seq(1, 10, 50, 80, 94, 120, 200, 500)) {
      val mins = (1 to n).map(i => f"an_operator_query_name_$i%04d" -> (i * 0.037))
      val line = Bench.compactContract(mins.map(_._2).sum, mins, "{}", "/tmp/sf")
      assert(line.length <= 1890, s"n=$n -> ${line.length} chars")
      parseable(line)
    }
  }

  test("omitted count is exact") {
    val mins = (1 to 150).map(i => f"q_$i%03d_with_a_rather_long_operator_name" -> (i * 0.01))
    val line = Bench.compactContract(1.0, mins, "{}", "/tmp/sf")
    val om = """"omitted":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
    val kept = """"q_\d{3}_with_a_rather_long_operator_name":""".r
      .findAllIn(line).size
    assert(om.isDefined)
    assert(kept + om.get == 150)
  }

  test("every registered query has an oracle, and no oracle is orphaned") {
    // a typo'd key on either side silently removes a gate: the driver
    // compares only oracle keys, and a query with no oracle degrades to
    // a rows-only check nobody asked for. DELIBERATE rows-only gauges
    // must be enumerated here with their justification — silence is not
    // an opt-out.
    // EMPTY as of round 14: pq_recall_opq — the last rows-only gauge —
    // is now hash-gated via the trained-literal oracle (the query
    // stashes the trained rotation; the dump-time oracle replays it as
    // plan literals). Future deliberate rows-only gauges go here WITH
    // their justification — silence is not an opt-out.
    val rowsOnlyByDesign = Set.empty[String]
    val q = SparkEntry.queries.keySet -- rowsOnlyByDesign
    val o = SparkEntry.oracleSql.keySet
    assert(rowsOnlyByDesign.subsetOf(SparkEntry.queries.keySet),
      "rows-only allowlist names a query that no longer exists")
    assert(rowsOnlyByDesign.intersect(o).isEmpty,
      "a rows-only-by-design query grew an oracle; drop it from the list")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert(q.nonEmpty)
  }

  test("every gate query is cited in COVERAGE.md") {
    // the coverage index must be mechanically complete: a query that
    // passes the gate but has no COVERAGE row is invisible to the
    // operator-inventory audit (rounds 13-15 carried three such gaps —
    // sketch_kmv_jaccard, text_dup_spans, text_keyness — for three
    // rounds because nothing enforced the citation)
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    // citations count ONLY from the `Query` column of the coverage
    // tables — a name merely backticked in prose (or equal to an
    // operator name in another column) must not satisfy the check
    val citedSet = scala.collection.mutable.Set.empty[String]
    var qIdx = -1
    cov.linesIterator.foreach { line =>
      if (line.startsWith("|")) {
        // split on UNESCAPED pipes only — cells legitimately carry
        // markdown-escaped `\|` (e.g. "P(next\|prev)", "\|A \ B\|")
        val cells = line.split("(?<!\\\\)\\|", -1).map(_.trim)
        val hdr = cells.indexOf("Query")
        if (hdr >= 0) qIdx = hdr
        else if (qIdx >= 0 && qIdx < cells.length)
          citedSet ++= "`([a-zA-Z0-9_]+)`".r
            .findAllMatchIn(cells(qIdx)).map(_.group(1))
      } else qIdx = -1 // a table ended; the next needs its own header
    }
    val cited = citedSet.toSet
    val missing = SparkEntry.queries.keySet -- cited
    assert(missing.isEmpty,
      s"gate queries uncited in COVERAGE.md: ${missing.toSeq.sorted}")
  }
}

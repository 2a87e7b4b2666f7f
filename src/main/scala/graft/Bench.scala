package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Methodology (the round-4 lesson: a single timed pass cannot tell a real
  * 1.5x regression from machine contention — the official r4 number carried
  * ~28s of noise on untouched queries):
  *
  *  - one UN-timed warm-up pass of the full query set first (JIT, codegen
  *    caches, parquet footers, OS page cache);
  *  - then `SPARK_GRAFT_BENCH_REPS` (default 3) timed repetitions;
  *  - then the slowest `SPARK_GRAFT_BENCH_EXTRA_K` (default 20) queries
  *    by provisional min get `SPARK_GRAFT_BENCH_EXTRA_REPS` (default 2)
  *    extra timed observations — the round-10 rep spread hit 27% and the
  *    heavy graph queries absorbed most of it; more samples where the
  *    seconds are buys the min convergence the cheap queries already have;
  *  - `queries` reports the per-query MIN across all observations — the
  *    least-contended observation, the stable signal for regression diffs;
  *  - `value` is the sum of per-query minimums; `rep_totals` keeps each
  *    FULL repetition's raw total so run-to-run variance is itself
  *    measurable (the partial extra passes are excluded);
  *  - NOISE GUARD (round-12 lesson: a 30% rep spread manufactured the
  *    round's only regression flag on untouched code): the 1-min load
  *    average per core is sampled at every rep start and published as
  *    `rep_loads` (plus a loud stderr warning when the run STARTS on a
  *    busy host), and when the full-rep totals spread beyond
  *    `SPARK_GRAFT_BENCH_SPREAD_PCT` (default 15%) up to
  *    `SPARK_GRAFT_BENCH_MAX_SPREAD_REPS` (default 2) additional full
  *    passes run so mins converge; the realized `spread_pct` is on the
  *    detail line, so a noisy run is annotated as such rather than read
  *    as a regression.
  *
  * Operator-persisted intermediates ([[graft.util.Caches]]) and Spark's
  * plan-keyed cache are dropped before EVERY query (the round-9 lesson:
  * clearing only per pass let a query re-hit blocks an earlier query in
  * the same pass had persisted — Spark's CacheManager matches by logical
  * plan, not by DataFrame reference — so per-query times depended on the
  * query ORDER and diverged from any isolated/cold measurement, which is
  * how the committed triangle_count baseline and the driver's number came
  * to disagree by 2.9x). Every query now pays its own first-touch work:
  * numbers are reproducible in isolation, comparable across rounds, and
  * independent of what else is in the set.
  *
  * `SPARK_GRAFT_BENCH_ONLY` (comma-separated query names) restricts the
  * run for isolated re-measurement of a flagged query; unknown names fail
  * loudly rather than silently benching nothing.
  *
  * Output (the round-6 lesson: the harness that consumes this output
  * parses the FINAL JSON line from a bounded window of trailing stdout —
  * ~2 KB — so the rounds 5-6 single line, which had grown to ~4 KB of
  * full-precision doubles plus a median map, silently stopped parsing):
  *
  *  - first, a `{"metric":"detail",...}` line with full-precision mins,
  *    medians and untruncated error messages, for humans and
  *    `tools/bench_diff.py` history (the diff tool PREFERS this record);
  *  - LAST, the compact `{"metric":"total",...}` contract line — values
  *    rounded, no median map, error messages clipped — kept under the
  *    ~1.89 KB budget BY CONSTRUCTION: precision drops 3→2→1 decimals,
  *    and when the query set itself outgrows a 1-decimal full map (the
  *    round-8 state: 94+ names ≈ 2 KB of keys alone) the map keeps only
  *    the SLOWEST queries that fit and reports the rest as
  *    `"omitted":N` — total/errors/sf are always complete, and the
  *    slowest queries are exactly the ones a perf consumer needs.
  *
  * A failing query records `-1` in `queries` and its message in `errors` —
  * a broken query must never masquerade as a fast one.
  */
object Bench {

  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  private[graft] def jnum(v: Double, decimals: Int): String =
    if (v < 0) "-1"
    else { // strip trailing zeros (0.080 -> 0.08) but keep one decimal
      val s = s"%.${decimals}f".format(v).reverse.dropWhile(_ == '0').reverse
      if (s.endsWith(".")) s + "0" else s
    }

  private[graft] def jmap(kvs: Seq[(String, Double)], decimals: Int = -1): String =
    kvs.map { case (k, v) =>
      s"${jstr(k)}:${if (decimals < 0) v.toString else jnum(v, decimals)}"
    }.mkString("{", ",", "}")

  /** The compact contract line, <= `budget` chars BY CONSTRUCTION.
    *
    * Fallback ladder: full query map at 3, then 2, then 1 decimals; if the
    * name set itself no longer fits, keep the slowest-K queries (the ones
    * that matter to a perf consumer) at 1 decimal plus an `"omitted"`
    * count, growing K as large as the budget allows. `total`, `errors`
    * and `sf` are never dropped. Returns the line; only a pathological
    * input (e.g. a single enormous error string) can exceed the budget,
    * and the caller warns loudly in that case.
    */
  private[graft] def compactContract(
      total: Double,
      mins: Seq[(String, Double)],
      errJson: String,
      sfDir: String,
      budget: Int = 1890,
      runId: String = ""): String = {
    def line(qmap: String, omitted: Int): String = {
      val om = if (omitted > 0) s""","omitted":$omitted""" else ""
      val rid = if (runId.nonEmpty) s""","run_id":${jstr(runId)}""" else ""
      s"""{"metric":"total","value":${jnum(total, 3)},"unit":"sec","queries":$qmap$om,"errors":$errJson,"sf":${jstr(sfDir)}$rid}"""
    }
    val full = Seq(3, 2, 1).iterator
      .map(d => line(jmap(mins, d), 0))
      .find(_.length <= budget)
    full.getOrElse {
      // name-dominated overflow: keep the slowest-K that fit (failed
      // queries sort first so a -1 sentinel is never silently dropped)
      val bySlowness = mins.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }.reverse
      val candidates = (mins.size to 0 by -1).iterator
        .map(k => line(jmap(bySlowness.take(k), 1), mins.size - k))
      candidates.find(_.length <= budget).getOrElse(line("{}", mins.size))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val nReps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) =>
        val want = only.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = want.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
        want.sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    /** One pass over `subset` in sorted order; -1 marks a failure. */
    def pass(subset: Seq[String]): Map[String, Double] = {
      subset.map { name =>
        // cold-per-query contract: no operator-persisted intermediate or
        // plan-keyed cached block from an EARLIER query may serve this one
        graft.util.Caches.unpersistAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              errors.getOrElseUpdate(name, String.valueOf(e.getMessage).take(300))
              false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    }

    // Noise guard (the round-12 lesson: a 30% rep-total spread — 270/351/
    // 291 s — manufactured the round's only regression flag on untouched
    // code). Two parts: (1) the 1-minute load average per core is sampled
    // at every rep start and published on the detail line, so a busy-host
    // run is ANNOTATED as such instead of read as a code regression;
    // (2) when the full-rep totals spread more than
    // SPARK_GRAFT_BENCH_SPREAD_PCT (default 15%), up to
    // SPARK_GRAFT_BENCH_MAX_SPREAD_REPS (default 2) additional FULL
    // passes run so per-query mins converge on the uncontended time.
    def loadPerCore(): Double = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val l = os.getSystemLoadAverage
      if (l < 0) -1.0 else l / os.getAvailableProcessors
    }
    val repLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    def loadedPass(subset: Seq[String]): Map[String, Double] = {
      repLoads += loadPerCore()
      pass(subset)
    }
    val startLoad = loadPerCore()
    if (startLoad > 0.5)
      System.err.println(f"bench starting on a busy host: 1-min load/core" +
        f" = $startLoad%.2f (annotated on the detail line)")

    // Page-cache warm BEFORE any timed work (round 18 — the round-17
    // closing run's rep totals spread 33% on a cold first rep): the
    // warm-up PASS only faults in the bytes the queries project
    // (column pruning reaches the scan), so a later rep that reads a
    // column first touched mid-run still pays disk. Stream every byte
    // of the SF dir once; the dataset is O(GB) at bench scale and the
    // read is sequential.
    locally {
      val buf = new Array[Byte](1 << 20)
      java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir)).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          val in = java.nio.file.Files.newInputStream(p)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      }
    }

    pass(names) // warm-up, discarded
    val firstReps = (1 to nReps).map(_ => loadedPass(names))
    def spreadPct(rs: Seq[Map[String, Double]]): Double = {
      val totals = rs.map(_.values.filter(_ >= 0).sum).filter(_ > 0)
      if (totals.size < 2) 0.0
      else (totals.max - totals.min) / totals.min * 100.0
    }
    val spreadLimit =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD_PCT", "15").toDouble
    val maxSpreadReps =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_SPREAD_REPS", "2").toInt
    val reps = {
      var acc = firstReps
      while (spreadPct(acc) > spreadLimit
          && acc.size < nReps + maxSpreadReps) {
        System.err.println(f"rep-total spread ${spreadPct(acc)}%.1f%% > " +
          f"$spreadLimit%.1f%%: running an extra full rep to converge mins")
        acc = acc :+ loadedPass(names)
      }
      acc
    }
    // Noise control for the queries that dominate the total (the round-10
    // rep spread hit 27%): the slowest-K queries by provisional min get
    // extra timed observations, so their reported min converges on the
    // uncontended time. K and the extra-rep count are env-tunable; the
    // extra passes are PARTIAL and therefore excluded from rep_totals.
    val extraK = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA_K", "20").toInt
    val nExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA_REPS", "2").toInt
    val slowest = names
      .map { n =>
        val ok = reps.map(_(n)).filter(_ >= 0)
        n -> (if (ok.isEmpty) -1.0 else ok.min)
      }
      .filter(_._2 >= 0).sortBy(-_._2).take(extraK).map(_._1).sorted
    val extra =
      if (slowest.isEmpty || nExtra <= 0) Nil
      else (1 to nExtra).map(_ => pass(slowest))
    graft.util.Caches.unpersistAll()

    // A query is FAILED (-1) only when no full-rep observation succeeded;
    // otherwise the stat is computed over the successful observations. A
    // transient failure in one of the partial extra-K passes (or one full
    // rep) must not discard a min that converged over the full
    // repetitions — it would flip a green query to failed in the
    // regression diff on machine noise. Deterministically broken queries
    // fail every rep and still report -1.
    def stat(name: String, pick: Seq[Double] => Double): Double = {
      val full = reps.map(_(name))
      val ok = (full ++ extra.flatMap(_.get(name))).filter(_ >= 0)
      if (full.forall(_ < 0)) -1.0 else pick(ok)
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val mins = names.map(n => n -> stat(n, _.min))
    val meds = names.map(n => n -> stat(n, median))
    // `errors` reports FAILED queries only (the -1 contract); a message
    // captured by an observation that later recovered goes to stderr so
    // it stays visible without contradicting a green `queries` entry
    val green = mins.collect { case (n, v) if v >= 0 => n }.toSet
    errors.filterInPlace { (k, v) =>
      if (green(k))
        System.err.println(s"transient failure in $k (recovered): $v")
      !green(k)
    }

    def errJson(clip: Int): String = errors
      .map { case (k, v) => s"${jstr(k)}:${jstr(v.take(clip))}" }
      .mkString("{", ",", "}")
    val repTotals = reps
      .map(r => "%.3f".format(r.values.filter(_ >= 0).sum))
      .mkString("[", ",", "]")
    val total = mins.collect { case (_, v) if v >= 0 => v }.sum

    // run id shared by the detail record and the compact contract line:
    // tools/bench_diff.py matches the two on it, so a stale detail FILE
    // from a different run can never masquerade as this run's full map.
    val runId = f"${(System.nanoTime ^ ProcessHandle.current.pid) & 0xffffffffL}%08x"
    val methodStr = s"min of ${reps.size} reps after 1 warm-up pass" +
      (if (reps.size > nReps)
        s" (${reps.size - nReps} added by the >$spreadLimit%-spread guard)"
      else "") +
      (if (extra.nonEmpty) s" + $nExtra extra reps over the ${slowest.size} slowest" else "")
    val repLoadsJson = repLoads.map(l => "%.2f".format(l)).mkString("[", ",", "]")
    val spreadJson = "%.1f".format(spreadPct(reps))

    // Full-precision record first (scrolls out of the consumer's tail
    // window; tools/bench_diff.py and humans read it from the full log).
    val detail =
      s"""{"metric":"detail","value":$total,"unit":"sec","method":${jstr(methodStr)},"reps":${reps.size},"run_id":${jstr(runId)},"rep_totals":$repTotals,"rep_loads":$repLoadsJson,"spread_pct":$spreadJson,"queries":${jmap(
          mins)},"queries_median":${jmap(meds)},"errors":${errJson(300)},"sf":${jstr(sfDir)}}"""
    println(detail)
    // ... and persisted as a FILE: the driver's stdout record keeps only
    // a ~2 KB tail, which at 216 queries holds the slowest ~80 — the
    // file is the durable full map every query stays regressionable from
    // (tools/bench_diff.py prefers it; committed per round as
    // BENCH_detail.json). The default path anchors to the repo root
    // (nearest ancestor of CWD holding build.sbt) rather than raw CWD, so
    // a driver running from a subdirectory still lands the file where
    // bench_diff.py's fallback looks for it.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", {
      def findRoot(d: java.io.File): Option[java.io.File] =
        if (d == null) None
        else if (new java.io.File(d, "build.sbt").exists()) Some(d)
        else findRoot(d.getParentFile)
      val root = findRoot(new java.io.File(".").getAbsoluteFile)
      new java.io.File(root.getOrElse(new java.io.File(".")),
        "BENCH_detail.json").getPath
    })
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detail) finally w.close()
    } catch {
      case e: Exception =>
        System.err.println(s"could not write $detailPath: ${e.getMessage}")
    }

    // Compact contract line LAST — must fit the consumer's bounded tail
    // window (~2 KB) together with the build tool's trailing status line
    // (budget: 2000 minus ~80 -> 1890). compactContract keeps the line
    // within budget by construction (slowest-K subset + "omitted" when the
    // full map no longer fits); reps/rep_totals/medians live on the detail
    // line above.
    val line = compactContract(total, mins, errJson(60), sfDir, runId = runId)
    if (line.length > 1890) // only reachable via a pathological error string
      System.err.println(s"BENCH CONTRACT BROKEN: compact line is " +
        s"${line.length} chars (> 1890 budget); the consumer's 2 KB tail " +
        "window will truncate it — shorten error messages or query names")
    println(line)
    spark.stop()
  }
}

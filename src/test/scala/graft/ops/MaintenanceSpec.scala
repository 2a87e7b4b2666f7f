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

  test("snapshots: publish assigns versions, time travel reads any of them") {
    val base = Files.createTempDirectory("m_snap").toString + "/t"
    val v1 = Maintenance.publishSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), base)
    val v2 = Maintenance.publishSnapshot(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), base)
    assert((v1, v2) == ((1L, 2L)))
    assert(Maintenance.readSnapshot(spark, base, Some(1L)).count() == 2)
    assert(Maintenance.readSnapshot(spark, base).count() == 3) // latest
    assert(Maintenance.committedVersions(spark, base) ==
      Seq((1L, 2L), (2L, 3L)))
    intercept[IllegalArgumentException] {
      Maintenance.readSnapshot(spark, base, Some(9L))
    }
  }

  test("snapshots: an uncommitted data directory is unreadable by design") {
    val base = Files.createTempDirectory("m_orphan").toString + "/t"
    Maintenance.publishSnapshot(Seq((1L, "a")).toDF("id", "v"), base)
    // simulate a crashed publish: data written, version row never landed
    Seq((9L, "x")).toDF("id", "v").write.parquet(s"$base/data/v=2")
    assert(Maintenance.committedVersions(spark, base).map(_._1) == Seq(1L))
    assert(Maintenance.readSnapshot(spark, base).count() == 1) // still v1
    intercept[IllegalArgumentException] {
      Maintenance.readSnapshot(spark, base, Some(2L))
    }
  }

  test("snapshots: a crashed publish's orphan is reclaimed, not wedging") {
    val base = Files.createTempDirectory("m_reclaim").toString + "/t"
    Maintenance.publishSnapshot(Seq((1L, "a")).toDF("id", "v"), base)
    // simulate the crash: data/v=2 written, _versions row never landed
    Seq((9L, "x")).toDF("id", "v").write.parquet(s"$base/data/v=2")
    // the next publish computes v=2 again; it must reclaim the orphan
    // and succeed instead of failing on mode("errorifexists")
    val v2 = Maintenance.publishSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), base)
    assert(v2 == 2L)
    assert(Maintenance.readSnapshot(spark, base, Some(2L)).count() == 2)
    // the orphan's row (9, "x") is gone — the reclaim deleted it
    assert(Maintenance.readSnapshot(spark, base, Some(2L))
      .where($"id" === 9L).count() == 0)
  }

  test("snapshots: vacuum leaves no _versions.tmp and survivors read") {
    val base = Files.createTempDirectory("m_vtmp").toString + "/t"
    (1 to 3).foreach(i => Maintenance.publishSnapshot(
      (1 to i).map(j => (j.toLong, "x")).toDF("id", "v"), base))
    Maintenance.vacuumSnapshots(spark, base, keepLast = 1,
      Map("confirm.truncate" -> "true"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/_versions.tmp")),
      "staged swap must not leave the temp directory behind")
    assert(Maintenance.committedVersions(spark, base).map(_._1) == Seq(3L))
    assert(Maintenance.readSnapshot(spark, base).count() == 3)
  }

  test("snapshots: vacuum needs the latch, keeps the tail, survivors read") {
    val base = Files.createTempDirectory("m_vac").toString + "/t"
    (1 to 3).foreach(i => Maintenance.publishSnapshot(
      (1 to i).map(j => (j.toLong, "x")).toDF("id", "v"), base))
    intercept[IllegalArgumentException] {
      Maintenance.vacuumSnapshots(spark, base, keepLast = 1)
    }
    val dropped = Maintenance.vacuumSnapshots(spark, base, keepLast = 2,
      Map("confirm.truncate" -> "true"))
    assert(dropped == Seq(1L))
    assert(Maintenance.committedVersions(spark, base).map(_._1) ==
      Seq(2L, 3L))
    assert(Maintenance.readSnapshot(spark, base, Some(2L)).count() == 2)
    intercept[IllegalArgumentException] {
      Maintenance.readSnapshot(spark, base, Some(1L))
    }
    // vacuum with nothing to drop is a no-op
    assert(Maintenance.vacuumSnapshots(spark, base, keepLast = 5,
      Map("confirm.truncate" -> "true")).isEmpty)
  }

  test("changedKeys classifies inserts, deletes, updates; drops unchanged") {
    val prev = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val next = Seq((2L, "b", 20L), (3L, "c", 99L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val out = Maintenance.changedKeys(prev, next, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("changedKeys: null vs absent vs empty-string states stay distinct") {
    val prev = Seq((1L, Option("x"), Option("")),
      (2L, Option("y"), None)).toDF("k", "a", "b")
    val next = Seq((1L, Option("x"), None),
      (2L, Option("y"), Option(""))).toDF("k", "a", "b")
    val out = Maintenance.changedKeys(prev, next, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "update", 2L -> "update"),
      "null -> empty string must read as a change")
  }

  test("changedKeys rejects mismatched schemas") {
    val a = Seq((1L, "x")).toDF("k", "a")
    val b = Seq((1L, "x")).toDF("k", "b")
    intercept[IllegalArgumentException] {
      Maintenance.changedKeys(a, b, Seq("k"))
    }
  }

  test("snapshots: a held writer lock fails publish AND vacuum loudly") {
    val base = Files.createTempDirectory("m_lock").toString + "/t"
    Maintenance.publishSnapshot(Seq((1L, "a")).toDF("id", "v"), base)
    // simulate a crashed (or concurrent) writer's lingering lock
    Files.createFile(java.nio.file.Paths.get(s"$base/_publish.lock"))
    val e1 = intercept[IllegalStateException] {
      Maintenance.publishSnapshot(Seq((2L, "b")).toDF("id", "v"), base)
    }
    assert(e1.getMessage.contains("_publish.lock"))
    val e2 = intercept[IllegalStateException] {
      Maintenance.vacuumSnapshots(spark, base, keepLast = 1,
        Map("confirm.truncate" -> "true"))
    }
    assert(e2.getMessage.contains("_publish.lock"))
    // the documented recovery: delete the lock, writers proceed
    Files.delete(java.nio.file.Paths.get(s"$base/_publish.lock"))
    assert(Maintenance.publishSnapshot(
      Seq((2L, "b")).toDF("id", "v"), base) == 2L)
    // a clean writer leaves no lock behind
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/_publish.lock")))
  }

  test("snapshots: concurrent publishers never corrupt the table") {
    val base = Files.createTempDirectory("m_race").toString + "/t"
    Maintenance.publishSnapshot(Seq((1L, "a")).toDF("id", "v"), base)
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        start.await()
        try results.add(Right(Maintenance.publishSnapshot(
          Seq((10L + i, s"t$i")).toDF("id", "v"), base)))
        catch { case e: Throwable => results.add(Left(e)) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (losers, winners) = results.asScala.toSeq.partition(_.isLeft)
    // every loser failed LOUDLY on the lock, never silently or weirdly
    losers.foreach { l =>
      val e = l.swap.getOrElse(fail())
      assert(e.isInstanceOf[IllegalStateException] &&
        e.getMessage.contains("_publish.lock"), s"unexpected failure: $e")
    }
    // winners got DISTINCT versions and the commit log is consistent
    val vs = winners.map(_.getOrElse(fail()))
    assert(vs.distinct.size == vs.size)
    val committed = Maintenance.committedVersions(spark, base).map(_._1)
    assert(committed == committed.sorted && committed.distinct == committed)
    assert(vs.forall(committed.contains))
    committed.foreach(v =>
      Maintenance.readSnapshot(spark, base, Some(v)).count())
  }

  test("snapshots: an interrupted vacuum swap heals on READ") {
    val base = Files.createTempDirectory("m_healread").toString + "/t"
    (1 to 3).foreach(i => Maintenance.publishSnapshot(
      (1 to i).map(j => (j.toLong, "x")).toDF("id", "v"), base))
    // simulate the crash window: `_versions` deleted, fully-written
    // survivor stage still at `_versions.tmp`
    Files.move(java.nio.file.Paths.get(s"$base/_versions"),
      java.nio.file.Paths.get(s"$base/_versions.tmp"))
    // a pure READ completes the swap — no publish required
    assert(Maintenance.committedVersions(spark, base).map(_._1) ==
      Seq(1L, 2L, 3L))
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/_versions.tmp")))
    assert(Maintenance.readSnapshot(spark, base).count() == 3)
  }

  test("snapshots: a READ never heals while the writer lock is held") {
    // A reader landing inside a LIVE vacuum's swap window must not race
    // the vacuum's own rename (the round-11 advisory: a reader winning
    // the rename made the healthy vacuum's rename fail and abort before
    // orphan reclaim). With `_publish.lock` on disk the read reports the
    // table as it stands and leaves the staged tmp alone.
    val base = Files.createTempDirectory("m_lockread").toString + "/t"
    (1 to 2).foreach(i => Maintenance.publishSnapshot(
      (1 to i).map(j => (j.toLong, "x")).toDF("id", "v"), base))
    Files.move(java.nio.file.Paths.get(s"$base/_versions"),
      java.nio.file.Paths.get(s"$base/_versions.tmp"))
    Files.createFile(java.nio.file.Paths.get(s"$base/_publish.lock"))
    assert(Maintenance.committedVersions(spark, base).isEmpty,
      "mid-swap read under a held lock must see 'not published', not heal")
    assert(Files.exists(java.nio.file.Paths.get(s"$base/_versions.tmp")),
      "read must not touch the staged survivor list while locked")
    // lock released (writer finished or operator recovered): reads heal
    Files.delete(java.nio.file.Paths.get(s"$base/_publish.lock"))
    assert(Maintenance.committedVersions(spark, base).map(_._1) ==
      Seq(1L, 2L))
  }

  test("snapshots: vacuum reclaims orphaned data directories") {
    val base = Files.createTempDirectory("m_orphreclaim").toString + "/t"
    (1 to 3).foreach(i => Maintenance.publishSnapshot(
      (1 to i).map(j => (j.toLong, "x")).toDF("id", "v"), base))
    // an uncommitted directory: crashed publish, or a previous vacuum
    // that renamed its metadata but died before its directory deletes
    Seq((9L, "orphan")).toDF("id", "v").write.parquet(s"$base/data/v=9")
    // keepLast larger than history: drops nothing, but reclaims orphans
    assert(Maintenance.vacuumSnapshots(spark, base, keepLast = 10,
      Map("confirm.truncate" -> "true")).isEmpty)
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/data/v=9")),
      "uncommitted v=9 must be reclaimed by vacuum")
    assert(Maintenance.committedVersions(spark, base).map(_._1) ==
      Seq(1L, 2L, 3L))
    assert(Maintenance.readSnapshot(spark, base).count() == 3)
    // a dropping vacuum reclaims the dropped dirs too (no leak even if a
    // prior vacuum had crashed between rename and deletes)
    Maintenance.vacuumSnapshots(spark, base, keepLast = 1,
      Map("confirm.truncate" -> "true"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/data/v=1")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/data/v=2")))
    assert(Maintenance.readSnapshot(spark, base).count() == 3)
  }
}

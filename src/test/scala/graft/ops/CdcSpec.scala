package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0)
  ).toDF("k", "name", "score")

  test("upsert: update wins, insert appends, delete removes") {
    val changes = Seq(
      (2L, "beta2", 25.0, 1L, "U"),  // update key 2
      (4L, "delta", 40.0, 1L, "U"),  // insert key 4
      (3L, "gamma", 30.0, 1L, "D")   // delete key 3
    ).toDF("k", "name", "score", "v", "op")
    val out = Cdc.upsert(base, changes, "k", "v", "op")
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(out.find(_.getLong(0) == 2L).get.getString(1) == "beta2")
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha"), (2L, "beta2"), (4L, "delta")))
  }

  test("upsert: higher version wins; delete wins an exact version tie") {
    val changes = Seq(
      (1L, "v1", 1.0, 1L, "U"),
      (1L, "v2", 2.0, 2L, "U"),      // latest update for key 1
      (2L, "dead", 0.0, 5L, "D"),
      (2L, "alive", 9.0, 5L, "U")    // same version: delete must win
    ).toDF("k", "name", "score", "v", "op")
    val out = Cdc.upsert(base, changes, "k", "v", "op").orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out.head.getString(1) == "v2")
  }

  test("upsert rejects out-of-contract versions loudly (null and <= 0)") {
    // a version-0 'U' would tie the implicit base row (0,'U') exactly and
    // make the winner layout-dependent; a null version would silently lose
    // to base — both must raise, not produce nondeterministic output
    for (badV <- Seq(Some(0L), None)) {
      val changes = Seq((2L, "beta2", 25.0, badV, "U"))
        .toDF("k", "name", "score", "v", "op")
      val e = intercept[Exception] {
        Cdc.upsert(base, changes, "k", "v", "op").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          String.valueOf(x.getMessage) +: messages(x.getCause))
      assert(messages(e).exists(_.contains("must be > 0")),
        s"version=$badV: expected the contract error, got $e")
    }
  }

  test("upsert output schema equals base schema") {
    val changes = Seq((9L, "x", 0.0, 1L, "U")).toDF("k", "name", "score", "v", "op")
    assert(Cdc.upsert(base, changes, "k", "v", "op").columns.toSeq ==
      base.columns.toSeq)
  }

  test("scd2 collapses runs and bounds intervals") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 15L, "x")
    ).toDF("k", "ts", "state")
    val out = Cdc.scd2(log, "k", "ts", "state")
      .orderBy("k", "valid_from").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", 10L), ("b", 30L), ("a", 40L)))
    // exclusive upper bounds chain; only the last interval is open/current
    assert(k1.map(r => Option(r.get(3))).toSeq ==
      Seq(Some(30L), Some(40L), None))
    assert(k1.map(_.getBoolean(4)).toSeq == Seq(false, false, true))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getBoolean(4))
  }

  test("upsert rejects base columns that collide with its internals") {
    val bad = base.withColumn("__v", org.apache.spark.sql.functions.lit(9L))
    val changes = Seq((1L, "x", 0.0, 9L, 1L, "U"))
      .toDF("k", "name", "score", "__v", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.upsert(bad, changes, "k", "v", "op")
    }
    assert(e.getMessage.contains("__v"))
  }

  test("scd2 excludes null observation times by contract") {
    val log = Seq((1L, Some(10L), "a"), (1L, None, "b"), (1L, Some(20L), "c"))
      .toDF("k", "ts", "state")
    val out = Cdc.scd2(log, "k", "ts", "state").orderBy("valid_from").collect()
    // the null-ts observation anchors nothing; a, c remain
    assert(out.map(_.getString(1)).toSeq == Seq("a", "c"))
  }

  test("derive classifies I/U/D, skips unchanged keys, carries the right side") {
    val next = Seq(
      (2L, "beta2", 20.0),   // name changed -> U with next's data
      (3L, "gamma", 30.0),   // unchanged -> absent from the feed
      (4L, "delta", 40.0)    // new key -> I       (key 1 deleted -> D)
    ).toDF("k", "name", "score")
    val out = Cdc.derive(base, next, "k").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "alpha", 10.0, "D"),   // D carries old's last-known data
      (2L, "beta2", 20.0, "U"),
      (4L, "delta", 40.0, "I")))
  }

  test("derive is upsert's inverse: applying the feed reproduces next") {
    val next = Seq(
      (1L, "alpha", 11.0), (2L, "beta", 20.0), (5L, "eps", 50.0)
    ).toDF("k", "name", "score")
    val feed = Cdc.derive(base, next, "k")
      .withColumn("v", lit(1L))
      .withColumn("op2", when(col("op") === "D", "D").otherwise("U"))
    val replayed = Cdc.upsert(base, feed.select("k", "name", "score", "v", "op2"),
      "k", "v", "op2")
    assert(replayed.orderBy("k").collect().toSeq ==
      next.orderBy("k").collect().toSeq)
  }

  test("derive compares null-safely and rejects duplicate snapshot keys") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "name")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val out = Cdc.derive(o, n, "k").collect()
    // null == null: key 1 unchanged; key 2: x -> null is a U
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "name")
    val e = intercept[Exception] {
      Cdc.derive(dup, o, "k").collect()
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("scd2 windows share one partitioning (single exchange before runs)") {
    val log = Seq((1L, 10L, "a")).toDF("k", "ts", "state")
    val plan = Cdc.scd2(log, "k", "ts", "state")
      .queryExecution.executedPlan.toString
    // lag + running sum must reuse one sort/exchange on k, not stack two
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges\n$plan")
  }
}

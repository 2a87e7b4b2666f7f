package graft.ops

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "mail me at alice.smith+x@sub.example.org thanks"),
    (2L, "server 192.168.1.10 and 10.0.0.1 are down"),
    (3L, "call 555-0134 or 555-0199 today"),
    (4L, "nothing sensitive here"),
    (5L, "bob@ex.io from 172.16.254.3 phone 555-0100")
  ).toDF("doc_id", "text")

  test("stats counts each category on the original text") {
    val s = Pii.stats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(s(1L) == ((1L, 0L, 0L, true)))
    assert(s(2L) == ((0L, 2L, 0L, true)))
    assert(s(3L) == ((0L, 0L, 2L, true)))
    assert(s(4L) == ((0L, 0L, 0L, false)))
    assert(s(5L) == ((1L, 1L, 1L, true)))
  }

  test("scrub replaces every match with its placeholder") {
    val t = Pii.scrub(docs, "text").orderBy("doc_id")
      .select("text").as[String].collect()
    assert(t(0) == "mail me at <EMAIL> thanks")
    assert(t(1) == "server <IP> and <IP> are down")
    assert(t(2) == "call <PHONE> or <PHONE> today")
    assert(t(3) == "nothing sensitive here")
    assert(t(4) == "<EMAIL> from <IP> phone <PHONE>")
  }

  test("scrub preserves non-text columns and schema") {
    val out = Pii.scrub(docs, "text")
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.count() == 5)
  }

  test("phone pattern does not fire inside IPs or digit runs") {
    val d = Seq((1L, "ip 10.0.255.7 code 1234567 ok")).toDF("doc_id", "text")
    val s = Pii.stats(d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(s._3 == 1L) // the IP
    assert(s._4 == 0L) // no phone
  }

  test("the pass is narrow: no shuffle in the scrub plan") {
    val plan = Pii.scrub(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
  }

  private def people = Seq(
    (1L, "A", 30L), (2L, "A", 30L), (3L, "A", 30L),
    (4L, "B", 30L), (5L, "B", 40L)
  ).toDF("id", "seg", "age")

  test("kAnonymityProfile: combo sizes and the under-k flag") {
    val p = Pii.kAnonymityProfile(people, Seq("seg", "age"), k = 2)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(p(("A", 30L)) == ((3L, false)))
    assert(p(("B", 30L)) == ((1L, true)))
    assert(p(("B", 40L)) == ((1L, true)))
  }

  test("kAnonymize suppresses every quasi-id cell of under-k rows only") {
    val out = Pii.kAnonymize(people, Seq("seg", "age"), k = 2)
      .orderBy("id").select("seg", "age")
      .as[(String, String)].collect()
    assert(out.take(3).forall(_ == (("A", "30"))))
    assert(out.drop(3).forall(_ == (("*", "*"))))
  }

  test("kAnonymize keeps row count and non-quasi columns") {
    val out = Pii.kAnonymize(people, Seq("seg"), k = 3)
    assert(out.count() == 5)
    assert(out.columns.toSet == Set("id", "seg", "age"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("noisyCounts: clamped at zero, deterministic, salt re-draws") {
    val df = Seq.tabulate(20)(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "g")
    val a = Pii.noisyCounts(df, Seq("g"), scale = 2.0, salt = "s1")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = Pii.noisyCounts(df.repartition(7), Seq("g"), scale = 2.0, salt = "s1")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "layout-independent")
    assert(a.forall(_._3 >= 0L), "clamped at zero")
    val c = Pii.noisyCounts(df, Seq("g"), scale = 2.0, salt = "s2")
      .orderBy("g").collect().map(r => r.getLong(2))
    assert(a.map(_._3).toSeq != c.toSeq, "a different salt re-draws")
  }

  test("lDiversityProfile: a LARGE uniform-sensitive group is at risk, " +
      "a small diverse one is not") {
    val df = Seq(
      // combo A: 4 members, all sensitive = 's1' -> k-anonymous at k=4
      // but l-diversity 1: the group leaks the secret
      ("A", 1, "s1"), ("A", 1, "s1"), ("A", 1, "s1"), ("A", 1, "s1"),
      // combo B: 3 members, 3 distinct sensitive values -> fine at l=2
      ("B", 2, "s1"), ("B", 2, "s2"), ("B", 2, "s3")
    ).toDF("seg", "nat", "sens")
    val out = Pii.lDiversityProfile(df, Seq("seg", "nat"), "sens", l = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("A") == ((4L, 1L, true)),
      "size-4 uniform group must be flagged despite passing k-anonymity")
    assert(out("B") == ((3L, 3L, false)))
  }

  test("noisyCounts noise magnitude is Laplace-plausible at small scale") {
    // scale 0.001: noise rounds to 0 for almost every draw, so the
    // release equals the exact histogram
    val df = Seq.tabulate(30)(i => (i.toLong, s"g${i % 5}")).toDF("id", "g")
    val out = Pii.noisyCounts(df, Seq("g"), scale = 0.001, salt = "t")
      .collect()
    assert(out.forall(r => r.getLong(2) == r.getLong(1)))
  }

  test("pseudonymize: stable, salted, format-checked, NULL-preserving") {
    val df = Seq(Some(123L), Some(123L), Some(456L), None)
      .toDF("user_id")
    val out = Pii.pseudonymize(df, Seq("user_id"), "rel1")
      .collect().map(r => Option(r.getAs[String]("user_id")))
    // known vector: sha256("rel1:123") prefix, independently computed
    assert(out(0).contains("161e9ba80696935c"))
    assert(out(0) == out(1), "same input, same surrogate")
    assert(out(2).exists(s => s.length == 16 && s.matches("[0-9a-f]{16}")))
    assert(out(2) != out(0))
    assert(out(3).isEmpty, "NULL stays NULL")
    // a different salt relinks nothing
    val other = Pii.pseudonymize(df, Seq("user_id"), "rel2")
      .collect().map(r => Option(r.getAs[String]("user_id")))
    assert(other(0) != out(0))
  }

  test("pseudonymize covers multiple columns; audit finds no collisions") {
    val df = Seq((1L, "u1"), (2L, "u2")).toDF("a", "b")
    val out = Pii.pseudonymize(df, Seq("a", "b"), "s").collect()
    assert(out.forall(r => r.getAs[String]("a").matches("[0-9a-f]{16}")
      && r.getAs[String]("b").matches("[0-9a-f]{16}")))
    val ids = spark.range(0, 5000).toDF("user_id")
    assert(Pii.pseudonymCollisions(ids, "user_id", "rel1").count() == 0L,
      "64-bit surrogates over 5k ids: no collisions")
    // duplicate ORIGINALS are not collisions (distinct first)
    val dup = Seq(7L, 7L, 7L).toDF("user_id")
    assert(Pii.pseudonymCollisions(dup, "user_id", "rel1").count() == 0L)
  }

  test("randomizedResponse: deterministic brute replay of the GRR " +
      "mechanism and the inversion; estimates sum to n exactly") {
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a"),
      (5L, "b"), (6L, "a"), (7L, "c"), (8L, "b"), (9L, "a"), (10L, "c"))
    val df = rows.toDF("id", "v")
    val out = Pii.randomizedResponseCounts(df, "id", "v", 3, 4)
      .orderBy("value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // brute: same raw-md5 hash, same keep threshold, same pick index
    def h32raw(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val domain = Seq("a", "b", "c")
    val keep = (BigInt(3) * BigInt(2).pow(32) / BigInt(4)).toLong
    val reported = rows.map { case (id, v) =>
      if (h32raw(s"$id:rr") < keep) v
      else {
        val pick = (h32raw(s"$id:rr:pick") % 2).toInt
        val j = if (pick < domain.indexOf(v)) pick else pick + 1
        domain(j)
      }
    }
    val y = reported.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val expected = domain.map { c =>
      val yc = y.getOrElse(c, 0L)
      val est = BigDecimal((yc * 4 * 2 - n * 1).toDouble / (3 * 3 - 4))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (c, yc, est)
    }
    assert(out == expected, s"got $out want $expected")
    // the GRR inversion telescopes: sum of estimates == n exactly
    assert(math.abs(out.map(_._3).sum - n) < 1e-3, out.toString)
    // the mechanism must actually flip something at p = 3/4, or the
    // test is vacuous
    assert(reported != rows.map(_._2), "no flips at this seed/salt")
    val rp = Pii
      .randomizedResponseCounts(df.repartition(5), "id", "v", 3, 4)
      .orderBy("value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rp == out)
    // p <= 1/d leaves the estimator degenerate — loud, not garbage
    intercept[IllegalArgumentException] {
      Pii.randomizedResponseCounts(df, "id", "v", 1, 4)
    }
    // a 1-value domain has no "other value" to report
    intercept[IllegalArgumentException] {
      Pii.randomizedResponseCounts(df.where($"v" === "a"), "id", "v", 3, 4)
    }
  }
}

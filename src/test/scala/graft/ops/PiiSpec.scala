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
}

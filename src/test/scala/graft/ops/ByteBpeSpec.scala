package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn: hand-computed byte-pair argmax, chained merges, tie to " +
      "the smallest (a, b) hex pair") {
    // "the" x3 -> pairs (74,68) x3, (68,65) x3: tie breaks to the
    // lexicographically smaller left symbol "68" < "74".
    val docs = (1 to 3).map(_ => "the").toDF("text")
    val m = ByteBpe.learn(docs, "text", rounds = 2)
      .orderBy("merge_round").collect()
    assert(m(0).getAs[String]("left_sym") == "68" &&
      m(0).getAs[String]("right_sym") == "65" &&
      m(0).getAs[String]("merged") == "6865" &&
      m(0).getAs[Long]("cnt") == 3L)
    // round 2: remaining pair (74, 6865)
    assert(m(1).getAs[String]("left_sym") == "74" &&
      m(1).getAs[String]("right_sym") == "6865")
    // exhaustion: one symbol per word left -> stops early
    val m3 = ByteBpe.learn(docs, "text", rounds = 10).collect()
    assert(m3.length == 2)
  }

  test("learn counts multi-byte UTF-8 codepoints as MULTIPLE byte " +
      "symbols and single-char words still participate") {
    // 'é' is 0xC3 0xA9 in UTF-8: the word "é" alone has the pair
    // (C3, A9) — a char-level learner would see a single symbol and
    // no pair at all.
    val docs = (1 to 5).map(_ => "é").toDF("text")
    val m = ByteBpe.learn(docs, "text", rounds = 1).collect()
    assert(m.length == 1)
    assert(m(0).getAs[String]("left_sym") == "C3" &&
      m(0).getAs[String]("right_sym") == "A9" &&
      m(0).getAs[Long]("cnt") == 5L)
  }

  test("encode: hand-counted tokens under a pinned merge chain; no " +
      "UNK possible; byte counts are UTF-8 octets") {
    // merges: t+h, th+e (chained)
    val merges = Seq("74" -> "68", "7468" -> "65")
    val docs = Seq(
      (1L, "the"),      // [the] -> 1 token, 3 bytes
      (2L, "th th"),    // [th] x2 -> 2 tokens, 4 bytes
      (3L, "éx"),       // C3 A9 78 -> no merge applies -> 3 tokens
      (4L, "q"))        // unseen byte -> its own symbol, never UNK
      .toDF("doc_id", "text")
    val out = ByteBpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") == 1L &&
      out(0).getAs[Long]("n_bytes") == 3L)
    assert(out(1).getAs[Long]("n_words") == 2L &&
      out(1).getAs[Long]("n_tokens") == 2L &&
      out(1).getAs[Long]("n_bytes") == 4L)
    assert(out(2).getAs[Long]("n_tokens") == 3L &&
      out(2).getAs[Long]("n_bytes") == 3L)
    assert(out(3).getAs[Long]("n_tokens") == 1L &&
      out(3).getAs[Long]("n_bytes") == 1L)
  }

  test("round-trip pin: stripping the frame separators from the " +
      "encoded word equals hex(UTF-8 bytes) at EVERY merge depth — " +
      "decode(encode(w)) is the identity on bytes") {
    val words = Seq("the", "then", "éclair", "日本語", "a", "ß",
      "mixed日本and-ascii").toDF("w")
    // the full pinned chain from the gate plus a multi-byte merge
    val merges = Seq("74" -> "68", "7468" -> "65", "C3" -> "A9",
      "69" -> "6E")
    val sep = "\u001F"
    val framed = regexp_replace(hex(encode(col("w"), "UTF-8")),
      "(..)", s"$sep$$1$sep")
    (0 to merges.size).foreach { depth =>
      val enc = merges.take(depth).foldLeft(framed) { case (e, (a, b)) =>
        replace(e, lit(s"$sep$a$sep$sep$b$sep"), lit(s"$sep$a$b$sep"))
      }
      val bad = words.select(
        replace(enc, lit(sep), lit("")).as("rt"),
        hex(encode(col("w"), "UTF-8")).as("want"))
        .where(col("rt") =!= col("want")).count()
      assert(bad == 0L, s"round-trip broke at merge depth $depth")
    }
  }

  test("encode rejects non-hex merge symbols loudly") {
    val docs = Seq((1L, "the")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      ByteBpe.encode(docs, "doc_id", "text", Seq("t" -> "h")).collect()
    }
    intercept[IllegalArgumentException] {
      ByteBpe.encode(docs, "doc_id", "text", Seq("7" -> "4")).collect()
    }
  }

  test("fertility: per-group rollup, bytes_per_token, and result " +
      "independence from input partitioning") {
    val docs = Seq(
      ("en", "the the then"),   // en: 3 words
      ("en", "the"),
      ("fr", "éé")).toDF("lang", "text")
    val merges = Seq("74" -> "68", "7468" -> "65")
    val out = ByteBpe.fertility(docs, "text", "lang", merges)
      .orderBy("group").collect()
    // en: words the(1 tok,3B) x3 ... "then" = [the][6E] 2 toks 4B
    //   n_words 4, n_tokens = 1+1+2+1 = 5, n_bytes = 3+3+4+3 = 13
    assert(out(0).getAs[String]("group") == "en" &&
      out(0).getAs[Long]("n_docs") == 2L &&
      out(0).getAs[Long]("n_words") == 4L &&
      out(0).getAs[Long]("n_tokens") == 5L &&
      out(0).getAs[Long]("n_bytes") == 13L)
    assert(out(0).getAs[Double]("fertility") == 1.25)
    assert(out(0).getAs[Double]("bytes_per_token") == 2.6)
    // fr: "éé" = C3 A9 C3 A9 -> 4 tokens, 4 bytes
    assert(out(1).getAs[Long]("n_tokens") == 4L &&
      out(1).getAs[Long]("n_bytes") == 4L)
    val rep = ByteBpe.fertility(docs.repartition(7), "text", "lang",
      merges).orderBy("group").collect()
    assert(rep.map(_.toString).toSeq == out.map(_.toString).toSeq)
  }
}

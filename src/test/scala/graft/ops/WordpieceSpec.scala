package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("learn: the likelihood score picks the EXCLUSIVE pair over the " +
      "frequent-but-independent pair BPE would take") {
    // "aa" x10: pair (a,a) cnt 10, but 'a' is ubiquitous (scnt 20)
    // "xy" x2:  pair (x,y) cnt 2, both symbols exclusive (scnt 2)
    // score(a,a) = 10/400 = 0.025 < score(x,y) = 2/4 = 0.5
    val docs = ((1 to 10).map(_ => "aa") ++ (1 to 2).map(_ => "xy"))
      .toDF("text")
    val wp = Wordpiece.learn(docs, "text", rounds = 1).collect().head
    assert(wp.getAs[String]("left_sym") == "x" &&
      wp.getAs[String]("right_sym") == "y")
    assert(wp.getAs[Long]("cnt") == 2L)
    assert(wp.getAs[Double]("score") == 0.5)
    // BPE on the same corpus merges the frequent pair instead
    val bpe = TextAnalysis.bpeLearnMerges(docs, "text", rounds = 1)
      .collect().head
    assert(bpe.getAs[String]("left_sym") == "a" &&
      bpe.getAs[String]("right_sym") == "a")
  }

  test("learn: merged symbols chain across rounds; score ties break " +
      "to the smallest (a, b)") {
    val docs = (1 to 4).map(_ => "abc").toDF("text")
    // round 1: pairs (a,b) and (b,c) both cnt 4, all syms scnt 4 ->
    // equal scores 4/16; tie -> (a,b). round 2: (ab,c) is the only pair.
    val m = Wordpiece.learn(docs, "text", rounds = 2)
      .orderBy("merge_round").collect()
    assert(m.length == 2)
    assert(m(0).getAs[String]("merged") == "ab")
    assert(m(1).getAs[String]("left_sym") == "ab" &&
      m(1).getAs[String]("right_sym") == "c")
    // exhaustion: a single-symbol corpus stops after the last real merge
    val m3 = Wordpiece.learn(docs, "text", rounds = 10).collect()
    assert(m3.length == 2)
  }

  test("encode: maximal munch, ## continuations, UNK word convention") {
    val pieces = Seq("ab", "a", "##b", "##c", "##cd")
    val docs = Seq(
      (1L, "abcd"),   // ab + ##cd -> 2 tokens
      (2L, "ab ab"),  // 2 words, 1 token each
      (3L, "abe"),    // ab then '##e' missing -> UNK (1 token)
      (4L, "b"))      // word-initial 'b' missing (only ##b) -> UNK
      .toDF("doc_id", "text")
    val out = Wordpiece.encode(docs, "doc_id", "text", pieces,
      maxPieceLen = 2).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") == 2L &&
      out(0).getAs[Long]("n_unk") == 0L)
    assert(out(1).getAs[Long]("n_words") == 2L &&
      out(1).getAs[Long]("n_tokens") == 2L)
    assert(out(2).getAs[Long]("n_tokens") == 1L &&
      out(2).getAs[Long]("n_unk") == 1L)
    assert(out(3).getAs[Long]("n_unk") == 1L)
  }

  test("encode matches a brute greedy reference on random words and " +
      "random vocabularies") {
    val rnd = new scala.util.Random(9218)
    val alpha = "abcde"
    def word(n: Int) =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val words = (1 to 300).map(_ => word(1 + rnd.nextInt(9)))
    // random piece set: some initials, some continuations, all len 1-3
    val pieces = ((1 to 25).map(_ => word(1 + rnd.nextInt(3))) ++
      (1 to 25).map(_ => "##" + word(1 + rnd.nextInt(3)))).distinct
    val pieceSet = pieces.toSet
    def brute(w: String): (Long, Boolean) = {
      var pos = 0; var tok = 0L
      while (pos < w.length) {
        val ks = (1 to math.min(3, w.length - pos)).reverse
        ks.find { k =>
          val raw = w.substring(pos, pos + k)
          pieceSet.contains(if (pos == 0) raw else "##" + raw)
        } match {
          case Some(k) => tok += 1; pos += k
          case None => return (1L, true)
        }
      }
      (tok, false)
    }
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val out = Wordpiece.encode(docs, "doc_id", "text", pieces,
      maxPieceLen = 3).orderBy("doc_id").collect()
    out.zip(words).foreach { case (r, w) =>
      val (tok, unk) = brute(w)
      assert(r.getAs[Long]("n_tokens") == tok,
        s"word '$w': ${r.getAs[Long]("n_tokens")} vs $tok")
      assert(r.getAs[Long]("n_unk") == (if (unk) 1L else 0L), s"'$w'")
    }
  }

  test("fertility: per-group rollup with unk_rate; partitioning-" +
      "invariant") {
    val pieces = Seq("ab", "a", "##b")
    val docs = Seq(
      ("en", "ab ab a"), ("en", "aab"),
      ("de", "zz ab"))
      .toDF("lang", "text")
    val out = Wordpiece.fertility(docs, "text", "lang", pieces,
      maxPieceLen = 2).orderBy("group").collect()
    // de: zz -> UNK(1 tok), ab -> 1 tok: 2 words, 2 tokens, 1 unk
    assert(out(0).getAs[String]("group") == "de")
    assert(out(0).getAs[Long]("n_words") == 2L &&
      out(0).getAs[Long]("n_tokens") == 2L &&
      out(0).getAs[Long]("n_unk") == 1L)
    assert(out(0).getAs[Double]("unk_rate") == 0.5)
    // en: ab(1) ab(1) a(1) aab(a+##b... 'a','##a'? no ##a -> check)
    assert(out(1).getAs[String]("group") == "en")
    assert(out(1).getAs[Long]("n_docs") == 2L)
    val rp = Wordpiece.fertility(docs.repartition(4), "text", "lang",
      pieces, maxPieceLen = 2).orderBy("group").collect()
    assert(out.toSeq == rp.toSeq)
  }
}

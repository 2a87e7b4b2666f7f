package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  test("table sanity: generated from the real cp1252 transform, " +
      "longest-first, no entry contains another (order-independent)") {
    assert(Mojibake.Table.nonEmpty)
    // every entry IS the real double-decode of its target
    Mojibake.Table.foreach { case (m, c) =>
      assert(Mojibake.corrupt(c) == m, s"artifact for '$c' drifted")
      assert(!m.contains('�'))
    }
    // the cp1252-undefined case is excluded: ” (E2 80 9D, 0x9D undef)
    assert(!Mojibake.Table.exists(_._2 == "”"))
    // longest-first and substring-free
    val lens = Mojibake.Table.map(_._1.length)
    assert(lens == lens.sortBy(-(_: Int)))
    for ((a, i) <- Mojibake.Table.zipWithIndex;
         (b, j) <- Mojibake.Table.zipWithIndex if i != j)
      assert(!a._1.contains(b._1),
        s"'${b._1}' inside '${a._1}' — replace order would matter")
  }

  test("round-trip pin over the FULL table domain: " +
      "repair(double-decode(s)) == s, corrupt side computed by the " +
      "real byte transform") {
    val rnd = new scala.util.Random(19)
    val chars = Mojibake.Table.map(_._2)
    val samples = (1 to 200).map { _ =>
      (1 to 12).map { _ =>
        if (rnd.nextBoolean()) ('a' + rnd.nextInt(26)).toChar.toString
        else chars(rnd.nextInt(chars.size))
      }.mkString
    } ++ chars.map(c => s"x${c}y$c") :+ "plain ascii only"
    val df = samples.zipWithIndex
      .map { case (s, i) => (i.toLong, Mojibake.corrupt(s), s) }
      .toDF("doc_id", "damaged", "want")
    val out = Mojibake.repair(df, "doc_id", "damaged")
      .join(df.select(col("doc_id"), col("want"), col("damaged")), "doc_id")
    assert(out.where(col("text") =!= col("want")).count() == 0L)
    // changed flags exactly the rows the transform actually altered
    assert(out.where(col("changed") =!=
      (col("damaged") =!= col("want"))).count() == 0L)
  }

  test("clean ASCII and already-clean accents pass through unchanged") {
    val df = Seq((1L, "nothing to fix here"), (2L, "déjà vu intact"))
      .toDF("doc_id", "text")
    val out = Mojibake.repair(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out(0).getAs[String]("text") == "nothing to fix here")
    assert(!out(0).getAs[Boolean]("changed"))
    assert(out(1).getAs[String]("text") == "déjà vu intact")
    assert(!out(1).getAs[Boolean]("changed"))
  }

  test("null text stays null and reads unchanged; row preserved") {
    val df = Seq((1L, Option("Ã©tÃ©")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Mojibake.repair(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out(0).getAs[String]("text") == "été" &&
      out(0).getAs[Boolean]("changed"))
    assert(out(1).isNullAt(1) && !out(1).getAs[Boolean]("changed"))
  }

  test("depth-2 round-trip over the closure domain: " +
      "repair(corrupt(corrupt(s)), depth = 2) == s, corrupt side the " +
      "real byte transform; depth passes are no-ops on clean text") {
    // chars whose DOUBLE corruption stays inside cp1252 (no undefined
    // byte at either layer) — the honest depth-2 domain
    val chars = Mojibake.Table.map(_._2).filter { c =>
      val c2 = Mojibake.corrupt(Mojibake.corrupt(c))
      !c2.contains('�')
    }
    assert(chars.size >= 40, s"depth-2 domain too small: ${chars.size}")
    val rnd = new scala.util.Random(192)
    val samples = (1 to 150).map { _ =>
      (1 to 10).map { _ =>
        if (rnd.nextBoolean()) ('a' + rnd.nextInt(26)).toChar.toString
        else chars(rnd.nextInt(chars.size))
      }.mkString
    } :+ "ascii stays ascii"
    val df = samples.zipWithIndex.map { case (s, i) =>
      (i.toLong, Mojibake.corrupt(Mojibake.corrupt(s)), s) }
      .toDF("doc_id", "damaged", "want")
    val out = Mojibake.repair(df, "doc_id", "damaged", depth = 2)
      .join(df.select(col("doc_id"), col("want")), "doc_id")
    assert(out.where(col("text") =!= col("want")).count() == 0L)
    // extra depth on clean text is a no-op
    val clean = Seq((1L, "déjà café – fine…")).toDF("doc_id", "text")
    val r = Mojibake.repair(clean, "doc_id", "text", depth = 3)
      .collect().head
    assert(r.getAs[String]("text") == "déjà café – fine…" &&
      !r.getAs[Boolean]("changed"))
    intercept[IllegalArgumentException] {
      Mojibake.repair(clean, "doc_id", "text", depth = 0)
    }
  }

  test("nfcNormalize: decomposed sequences compose, Angstrom maps to " +
      "Å, composed text passes byte-identical, idempotent, null-safe") {
    val df = Seq(
      (1L, Option("tablé x")),   // e + combining acute
      (2L, Option("fÅst")),       // Angstrom sign U+212B
      (3L, Option("thé fine")),   // already composed
      (4L, Option("ﬁle ｱｲ １２")),      // compatibility chars: NFC keeps
      (5L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Mojibake.nfcNormalize(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "tablé x" &&
      out(0).getAs[Boolean]("changed"))
    assert(out(1).getAs[String]("text") == "fÅst" &&
      out(1).getAs[Boolean]("changed"))
    assert(out(2).getAs[String]("text") == "thé fine" &&
      !out(2).getAs[Boolean]("changed"))
    assert(out(3).getAs[String]("text") == "ﬁle ｱｲ １２" &&
      !out(3).getAs[Boolean]("changed"))
    assert(out(4).isNullAt(1) && !out(4).getAs[Boolean]("changed"))
    // idempotent: normalizing the output changes nothing
    val again = Mojibake.nfcNormalize(
      Mojibake.nfcNormalize(df, "doc_id", "text"), "doc_id", "text")
    assert(again.where(col("changed")).count() == 0L)
  }

  test("result is independent of input partitioning") {
    val docs = (1 to 50).map(i =>
      (i.toLong, Mojibake.corrupt(s"w$i café n°$i — ok…"))).toDF("doc_id", "text")
    val a = Mojibake.repair(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = Mojibake.repair(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(_.getAs[Boolean]("changed")))
  }
}

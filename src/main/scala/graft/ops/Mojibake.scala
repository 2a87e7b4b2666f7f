package graft.ops

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding repair for the classic UTF-8↔cp1252 double-decode — the
  * mojibake class that dominates real web corpora (ftfy's core case,
  * Speer 2019: "Ã©" where "é" was meant, "â€™" for "’"). The engine's
  * [[TextAnalysis]] charclass/script-mix operators DETECT mixed-script
  * damage; this operator REPAIRS it.
  *
  * MECHANISM. A document whose UTF-8 bytes were once decoded as
  * cp1252 carries, for every intended non-ASCII char c, the fixed
  * 2-3 char artifact m(c) = cp1252-decode(utf8-bytes(c)). The repair
  * is the PINNED TABLE of (m(c) → c) for the Western European +
  * smart-punctuation repertoire (the chars real-world mojibake is made
  * of), applied as one chained literal `replace` — a narrow codegen'd
  * string projection that replays verbatim in any engine. The table is
  * COMPUTED (not hand-typed) from the JVM's standardized cp1252
  * decoder at class-load, so it cannot drift from the real transform;
  * chars whose artifact hits a cp1252-undefined byte (e.g. ” = E2 80
  * 9D, 0x9D undefined → U+FFFD) are excluded — their artifacts are
  * decoder-dependent and a pinned repair would be a guess.
  *
  * SAFETY. 3-char artifacts (â-prefixed) and 2-char artifacts (Ã/Â-
  * prefixed) use disjoint lead chars and the UTF-8 continuation range
  * 0x80-BF never maps to Ã/Â under cp1252, so no table entry can
  * appear inside another — replace order cannot change the result
  * (still pinned longest-first). The inherent ftfy tradeoff stands: a
  * document that LEGITIMATELY contains "Ã©" is altered; on real
  * corpora that sequence is orders of magnitude likelier to be damage
  * (Speer 2019 measures exactly this asymmetry).
  *
  * Round-trip contract (pinned by MojibakeSpec over the full table
  * domain): repair(cp1252-double-decode(s)) == s for any s over
  * repertoire chars + ASCII — the corrupt side computed by the REAL
  * byte transform, not the table.
  *
  * Output of [[repair]] (row-preserving): (doc_id, text, changed) —
  * text repaired, changed = the repair altered the document (the
  * corpus-health counter a curation run reports).
  */
object Mojibake {

  /** Pinned repertoire: Latin-1 letters + cp1252 smart punctuation —
    * what Western-web mojibake is actually made of.
    */
  val Repertoire: String =
    "éèêëáàâãäåçíìîïóòôõöúùûüñýÿÉÈÊËÁÀÂÄÇÍÎÏÓÔÖÚÙÛÜÑß" +
      "’‘“”–—…•€£¥©®°±²³µ¶·¿¡«»"

  /** (artifact → intended char), longest artifacts first. Generated
    * from the JVM's cp1252 decoder; undefined-byte artifacts excluded.
    */
  val Table: Seq[(String, String)] = {
    val cp1252 = Charset.forName("windows-1252")
    Repertoire.toSeq.flatMap { ch =>
      val c = ch.toString
      val m = new String(c.getBytes(StandardCharsets.UTF_8), cp1252)
      if (m.contains('�') || m == c) None else Some(m -> c)
    }.sortBy { case (m, _) => (-m.length, m) }
  }

  /** The repair projection: one chained literal replace per table
    * entry, longest-first. Pure codegen'd string expression.
    */
  def repairCol(c: Column): Column =
    Table.foldLeft(c) { case (e, (m, r)) => replace(e, lit(m), lit(r)) }

  def repair(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        repairCol(col(textCol)).as("text"),
        // null text stays null and reads as unchanged, not unknown
        coalesce(repairCol(col(textCol)) =!= col(textCol), lit(false))
          .as("changed"))

  /** The corruption direction (for tests and fixtures): the REAL
    * byte-level double-decode, driver-side.
    */
  private[graft] def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8),
      Charset.forName("windows-1252"))
}

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

  private val cp1252 = Charset.forName("windows-1252")

  private def artifactOf(c: String): Option[String] = {
    val m = new String(c.getBytes(StandardCharsets.UTF_8), cp1252)
    if (m.contains('�') || m == c) None else Some(m)
  }

  /** (artifact → intended char), longest artifacts first. Generated
    * from the JVM's cp1252 decoder; undefined-byte artifacts excluded.
    *
    * The domain is the CLOSURE of the repertoire under "chars that
    * appear in artifacts" (round 19): a DOUBLE-decoded document carries
    * artifacts OF artifacts — corrupt²(é) = "ÃƒÂ©", whose repair needs
    * entries for Ã and © even though neither is a repertoire char. One
    * closure round adds the artifact alphabet ({Ã, Â, â} ∪ the cp1252
    * images of UTF-8 continuation bytes); iterating to a fixpoint makes
    * [[repair]] with depth d unwind d encoding layers, one per pass
    * (the ftfy fixpoint behavior). Converges fast — every introduced
    * char is one of cp1252's 256 images.
    */
  val Table: Seq[(String, String)] = {
    var domain = Repertoire.toSeq.map(_.toString).toSet
    var grown = true
    var guard = 0
    while (grown && guard < 8) {
      val introduced = domain.flatMap(artifactOf)
        .flatMap(_.toSeq).map(_.toString)
        .filter(c => c.head > '\u007f' && !domain.contains(c)
          && artifactOf(c).isDefined)
      grown = introduced.nonEmpty
      domain ++= introduced
      guard += 1
    }
    domain.toSeq.flatMap(c => artifactOf(c).map(m => m -> c))
      .sortBy { case (m, _) => (-m.length, m) }
  }

  private lazy val flatTable: Array[String] =
    Table.iterator.flatMap { case (m, r) => Iterator(m, r) }.toArray

  /** ONE repair pass: the table's literal replaces in order, longest
    * first, as a single native expression ([[graft.functions
    * .Expressions.ChainReplace]] — ~105 nested replace Columns would
    * overflow the analyzer; the kernel applies the same left-to-right
    * literal substitutions the nested-SQL-replace oracle does). Unwinds
    * one cp1252-decode layer (sometimes more when adjacent repairs
    * reassemble a deeper artifact mid-chain — always toward the fixed
    * point, never away from it).
    */
  def repairCol(c: Column): Column = repairColN(c, 1)

  private def repairColN(c: Column, passes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.Expressions.ChainReplace(
        org.apache.spark.sql.GraftColumnBridge.expression(c),
        flatTable, passes))

  /** `depth` repair passes — depth d unwinds up to d stacked
    * double-decodes (depth 1 = the common single mojibake; depth 2 =
    * the doubly-encoded web text ftfy iterates on). Extra passes on
    * already-clean text are no-ops, so depth is an upper bound, not a
    * requirement.
    */
  def repair(df: DataFrame, idCol: String, textCol: String,
      depth: Int = 1): DataFrame = {
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1, 4], got $depth")
    val fixed = repairColN(col(textCol), depth)
    df.select(col(idCol).as("doc_id"),
      fixed.as("text"),
      // null text stays null and reads as unchanged, not unknown
      coalesce(fixed =!= col(textCol), lit(false)).as("changed"))
  }

  /** Unicode NFC normalization (UAX #15) — the other half of encoding
    * hygiene: decomposed "e + U+0301" and composed "é" are DIFFERENT
    * byte strings to every hash/dedup/tokenizer operator until
    * canonically composed. Native quick-check kernel
    * ([[graft.functions.Expressions.NfcNormalize]]); output shape
    * mirrors [[repair]]: (doc_id, text, changed).
    */
  def nfcNormalize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def nfc(c: Column): Column =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.Expressions.NfcNormalize(
          org.apache.spark.sql.GraftColumnBridge.expression(c)))
    df.select(col(idCol).as("doc_id"),
      nfc(col(textCol)).as("text"),
      coalesce(nfc(col(textCol)) =!= col(textCol), lit(false))
        .as("changed"))
  }

  /** The corruption direction (for tests and fixtures): the REAL
    * byte-level double-decode, driver-side.
    */
  private[graft] def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8),
      Charset.forName("windows-1252"))
}

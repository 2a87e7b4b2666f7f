package graft.pipeline

/** Textual `${param}` substitution into SQL/statement text before execution.
  * (ref: SQLUtils.injectParameters call, CassandraExecute.scala:93 — with
  * `allowMissing=false` semantics: an unresolved placeholder is an error.)
  */
object SqlParams {
  // ${key} or ${key=default} (Arc SQLUtils default-value form).
  private val Placeholder = """\$\{\s*([A-Za-z0-9_.]+)\s*(?:=([^}]*))?\}""".r
  // Any leftover ${...}-shaped text after substitution, regardless of shape.
  private val AnyPlaceholder = """\$\{[^}]*\}""".r

  def inject(sql: String, params: Map[String, String], allowMissing: Boolean = false): String = {
    val out = Placeholder.replaceAllIn(sql, m => {
      val key = m.group(1)
      val default = Option(m.group(2))
      params.get(key).orElse(default) match {
        case Some(v)              => java.util.regex.Matcher.quoteReplacement(v)
        case None if allowMissing => java.util.regex.Matcher.quoteReplacement(m.matched)
        case None =>
          throw new IllegalArgumentException(s"sql parameter '$key' has no value")
      }
    })
    // Catch malformed placeholders the main pattern skipped (e.g. `${a b}`):
    // silently shipping them to the engine hides the config error.
    if (!allowMissing) {
      AnyPlaceholder.findFirstIn(out).foreach { leftover =>
        throw new IllegalArgumentException(s"unresolved sql placeholder '$leftover'")
      }
    }
    out
  }
}

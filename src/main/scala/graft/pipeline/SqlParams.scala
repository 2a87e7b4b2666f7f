package graft.pipeline

/** Textual `${param}` substitution into SQL/statement text before execution.
  * (ref: SQLUtils.injectParameters call, CassandraExecute.scala:93 — with
  * `allowMissing=false` semantics: an unresolved placeholder is an error.)
  */
object SqlParams {
  private val Placeholder = """\$\{([A-Za-z0-9_]+)\}""".r

  def inject(sql: String, params: Map[String, String], allowMissing: Boolean = false): String =
    Placeholder.replaceAllIn(sql, m => {
      val key = m.group(1)
      params.get(key) match {
        case Some(v) => java.util.regex.Matcher.quoteReplacement(v)
        case None if allowMissing => java.util.regex.Matcher.quoteReplacement(m.matched)
        case None =>
          throw new IllegalArgumentException(s"sql parameter '$key' has no value")
      }
    })
}

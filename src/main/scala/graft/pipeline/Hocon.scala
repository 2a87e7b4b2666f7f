package graft.pipeline

import scala.collection.mutable

/** Minimal HOCON reader for pipeline configs.
  *
  * The reference's configs are HOCON (Arc's typesafe-config entry point;
  * its `arc.json` integration configs are the JSON subset). No HOCON
  * library ships with Spark, so this implements the subset those pipeline
  * configs actually use, over a single recursive-descent pass that also
  * records a LINE NUMBER for every key path — the parse feeds both the
  * config reader and the `line N:` prefixes in config errors.
  *
  * Supported beyond JSON (which parses unchanged):
  *  - `//`, `#` line comments and C-style block comments
  *  - optional braces around the root object
  *  - unquoted keys, dotted path keys (`a.b.c = v` nests), `=` as `:`,
  *    separator-less object values (`key { ... }`)
  *  - newline as element/field separator (commas optional)
  *  - unquoted string values
  *  - duplicate keys: objects deep-merge, anything else last-wins
  *  - `${a.b.c}` / `${?a.b.c}` substitutions resolved against the document
  *    root (fixpoint, cycle-checked); optional-missing fields are dropped
  *  - string concatenation of adjacent simple values on one line
  *    (`url = ${host}":"${port}`)
  *  - `key += value` array appends (creates the array when absent)
  *  - `"""triple-quoted"""` strings (no escape processing; a quote run
  *    ends at its LAST three quotes)
  *  - `include "uri"` (file path, `file:` or `http(s):` URI): the target
  *    parses as an object and merges in place — textual-substitution
  *    semantics, so later keys in the including file override it and it
  *    overrides earlier ones. Included keys anchor their error line
  *    numbers to the include statement. Nesting is depth-capped (8),
  *    which also breaks include cycles.
  *
  * Not supported (not used by the reference configs): env-var fallback.
  */
object Hocon {

  /** Parsed document: the root object plus key-path -> line number
    * (paths like `stages[2].saveMode`; 1-based lines).
    */
  final case class Doc(root: Map[String, Any], lines: Map[String, Int])

  // internal markers prior to substitution resolution
  private final case class Sub(path: String, optional: Boolean)
  private final case class Concat(parts: List[Any])
  private final case class Append(value: Any) // `key += v` before merge
  private case object Missing

  /** Default include resolver: local file path, `file:` or `http(s):`
    * URI (same reader as statement/schema URIs).
    */
  def uriResolver: String => String = graft.ops.Statements.fromUri(_)

  def parse(text: String): Either[ConfigError, Doc] = parse(text, uriResolver)

  def parse(text: String, resolver: String => String): Either[ConfigError, Doc] =
    try {
      val p = new P(text, resolver, 0)
      p.skipVoid(newlines = true)
      val raw =
        if (p.peek == '{') { p.next(); p.obj("", root = false) }
        else p.obj("", root = true)
      val resolved = resolve(raw, raw, Nil).asInstanceOf[Map[String, Any]]
      Right(Doc(resolved, p.lines.toMap))
    } catch {
      case e: ParseErr =>
        Left(ConfigError("hocon",
          if (e.line > 0) s"line ${e.line}: ${e.msg}" else e.msg))
      case e: Exception => Left(ConfigError("hocon", s"malformed config document: ${e.getMessage}"))
    }

  private final class ParseErr(val line: Int, val msg: String) extends RuntimeException(msg)

  // ---- substitution resolution (against the raw root) ----

  private def lookup(root: Map[String, Any], path: String): Option[Any] =
    path.split('.').foldLeft(Option[Any](root)) {
      case (Some(m: Map[_, _]), seg) => m.asInstanceOf[Map[String, Any]].get(seg)
      case _                         => None
    }

  private def resolve(v: Any, root: Map[String, Any], seen: List[String]): Any = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => k -> resolve(x, root, seen) }
        .filter(_._2 != Missing)
    case xs: List[_] => xs.map(resolve(_, root, seen)).filter(_ != Missing)
    case Sub(path, optional) =>
      if (seen.contains(path))
        throw new ParseErr(0, s"substitution cycle through '$path'")
      lookup(root, path) match {
        case Some(x) => resolve(x, root, path :: seen)
        case None if optional => Missing
        case None =>
          throw new ParseErr(0, s"unresolved substitution '$${$path}'")
      }
    case Concat(parts) =>
      val rs = parts.map(resolve(_, root, seen)).filter(_ != Missing)
      rs.map {
        case null      => "null"
        case s: String => s
        case other     => other.toString
      }.mkString
    case other => other
  }

  // ---- recursive-descent parser ----

  private final class P(s: String, resolver: String => String, depth: Int) {
    var i = 0
    var line = 1
    val lines: mutable.Map[String, Int] = mutable.Map.empty

    def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
    private def peek2: Char = if (i + 1 < s.length) s.charAt(i + 1) else '\u0000'
    private def peek3: Char = if (i + 2 < s.length) s.charAt(i + 2) else '\u0000'
    def eof: Boolean = i >= s.length
    def next(): Char = { val c = s.charAt(i); if (c == '\n') line += 1; i += 1; c }
    private def err(msg: String) = throw new ParseErr(line, msg)

    /** Skip whitespace and comments; newlines only when asked (they are
      * significant as separators).
      */
    def skipVoid(newlines: Boolean): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (c == '\n' && !newlines) go = false
        else if (c.isWhitespace) next()
        else if (c == '#' || (c == '/' && peek2 == '/')) {
          while (!eof && peek != '\n') next()
        } else if (c == '/' && peek2 == '*') {
          next(); next()
          while (!eof && !(peek == '*' && peek2 == '/')) next()
          if (eof) err("unterminated block comment")
          next(); next()
        } else go = false
      }
    }

    /** true if the next content (skipping inline void) starts a new value
      * atom on the SAME line — drives concatenation.
      */
    private def atomFollows: Boolean = {
      skipVoid(newlines = false)
      !eof && !",}]\n".contains(peek)
    }

    def obj(path: String, root: Boolean): Map[String, Any] = {
      var m = Map.empty[String, Any]
      var done = false
      while (!done) {
        skipVoid(newlines = true)
        if (eof) {
          if (!root) err("unterminated object")
          done = true
        } else if (peek == '}') {
          if (root) err("unexpected '}'")
          next(); done = true
        } else {
          val keyLine = line
          val quoted = peek == '"'
          val key = parseKey()
          // `include "uri"`: only the bare word followed by a quoted
          // target — `include: v` / `include = v` stay ordinary fields
          val isInclude = !quoted && key == "include" &&
            { skipVoid(newlines = false); peek == '"' }
          if (isInclude) {
            val target = quotedString()
            if (depth >= 8) err(s"include nesting too deep at '$target'")
            val text =
              try resolver(target)
              catch { case e: Exception =>
                err(s"cannot read include '$target': ${e.getMessage}") }
            val sub = new P(text, resolver, depth + 1)
            val incRaw =
              try {
                sub.skipVoid(newlines = true)
                if (sub.peek == '{') { sub.next(); sub.obj("", root = false) }
                else sub.obj("", root = true)
              } catch { case e: ParseErr =>
                err(s"in include '$target' line ${e.line}: ${e.msg}") }
            // included keys anchor their line numbers to the include stmt
            def anchor(prefix: String, mm: Map[String, Any]): Unit =
              mm.foreach { case (k, v) =>
                val p2 = if (prefix.isEmpty) k else s"$prefix.$k"
                lines.getOrElseUpdate(p2, keyLine)
                v match {
                  case c: Map[_, _] => anchor(p2, c.asInstanceOf[Map[String, Any]])
                  case _            => ()
                }
              }
            anchor(path, incRaw)
            // textual-substitution merge order: later keys in this file
            // override the include; the include overrides earlier ones
            m = deepMerge(m, incRaw)
            skipVoid(newlines = false)
            if (peek == ',') next()
          } else {
          // quoted keys are literal (HOCON: "a.b" is ONE key; only bare
          // keys are dotted paths)
          val segs = if (quoted) List(key) else key.split('.').toList
          val fullPath = segs.foldLeft(path)((p, k) => if (p.isEmpty) k else s"$p.$k")
          lines.getOrElseUpdate(fullPath, keyLine)
          skipVoid(newlines = false)
          val value = peek match {
            case '+' if peek2 == '=' =>
              next(); next(); Append(parseValueLine(fullPath))
            case ':' | '=' => next(); parseValueLine(fullPath)
            case '{'       => next(); obj(fullPath, root = false)
            case _         => err(s"expected ':', '=', '+=' or '{' after key '$key'")
          }
          m = mergeIn(m, segs, value)
          skipVoid(newlines = false)
          if (peek == ',') next()
          }
        }
      }
      m
    }

    /** Deep-merge `value` into `m` at the (possibly dotted) key path —
      * HOCON object merge; non-objects last-wins.
      */
    private def mergeIn(m: Map[String, Any], segs: List[String], value: Any): Map[String, Any] =
      segs match {
        case k :: Nil =>
          (m.get(k), value) match {
            case (Some(xs: List[_]), Append(v)) => m + (k -> (xs :+ v))
            case (None, Append(v))              => m + (k -> List(v))
            case (Some(_), Append(_)) =>
              err(s"'$k +=' requires the existing value to be an array")
            case (Some(a: Map[_, _]), b: Map[_, _]) =>
              m + (k -> deepMerge(a.asInstanceOf[Map[String, Any]],
                b.asInstanceOf[Map[String, Any]]))
            case _ => m + (k -> value)
          }
        case k :: rest =>
          val child = m.get(k) match {
            case Some(c: Map[_, _]) => c.asInstanceOf[Map[String, Any]]
            case _                  => Map.empty[String, Any]
          }
          m + (k -> mergeIn(child, rest, value))
        case Nil => m
      }

    private def deepMerge(a: Map[String, Any], b: Map[String, Any]): Map[String, Any] =
      b.foldLeft(a) { case (acc, (k, v)) =>
        (acc.get(k), v) match {
          case (Some(x: Map[_, _]), y: Map[_, _]) =>
            acc + (k -> deepMerge(x.asInstanceOf[Map[String, Any]],
              y.asInstanceOf[Map[String, Any]]))
          case _ => acc + (k -> v)
        }
      }

    private def parseKey(): String =
      if (peek == '"') quotedString()
      else {
        val sb = new StringBuilder
        while (!eof && !peek.isWhitespace && !":=,{}[]#".contains(peek)
          && !(peek == '+' && peek2 == '=')
          && !(peek == '/' && (peek2 == '/' || peek2 == '*'))) sb.append(next())
        if (sb.isEmpty) err("expected a key")
        sb.toString
      }

    /** One value, including same-line concatenation of simple atoms. */
    def parseValueLine(path: String): Any = {
      skipVoid(newlines = false)
      val first = atom(path)
      first match {
        case _: Map[_, _] | _: List[_] => first // containers never concat
        case _ =>
          var parts = List[Any](first)
          var wsStart = i
          while ({ wsStart = i; atomFollows }) {
            // preserve the inter-atom whitespace (HOCON keeps it) — but
            // only the whitespace: the span may also contain a skipped
            // /* block comment */, which is not part of the value
            val ws = s.substring(wsStart, i).filter(_.isWhitespace)
            if (ws.nonEmpty) parts ::= ws
            parts ::= atom(path)
          }
          if (parts.sizeIs == 1) first else Concat(parts.reverse)
      }
    }

    private def atom(path: String): Any = peek match {
      case '{' => next(); obj(path, root = false)
      case '[' => next(); array(path)
      case '"' if peek2 == '"' && peek3 == '"' => tripleQuoted()
      case '"' => quotedString()
      case '$' if peek2 == '{' => substitution()
      case _   => unquoted()
    }

    /** Triple-quoted string: NO escape processing. A run of three or more
      * quotes ends the string, with the excess quotes (all but the final
      * three) belonging to the content — the HOCON rule that makes
      * `"""a""""` parse as `a"`.
      */
    private def tripleQuoted(): String = {
      next(); next(); next()
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (eof) err("unterminated triple-quoted string")
        else if (peek == '"' && peek2 == '"' && peek3 == '"') {
          var run = 0
          while (!eof && peek == '"') { next(); run += 1 }
          sb.append("\"" * (run - 3))
          done = true
        } else sb.append(next())
      }
      sb.toString
    }

    private def array(path: String): List[Any] = {
      val out = mutable.ListBuffer.empty[Any]
      var done = false
      while (!done) {
        skipVoid(newlines = true)
        if (eof) err("unterminated array")
        else if (peek == ']') { next(); done = true }
        else {
          lines.getOrElseUpdate(s"$path[${out.size}]", line)
          out += parseValueLine(s"$path[${out.size}]")
          skipVoid(newlines = true)
          if (peek == ',') next()
        }
      }
      out.toList
    }

    private def quotedString(): String = {
      next() // opening quote
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (eof) err("unterminated string")
        val c = next()
        c match {
          case '"'  => done = true
          case '\\' =>
            if (eof) err("unterminated escape")
            next() match {
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case '/'  => sb.append('/')
              case 'b'  => sb.append('\b')
              case 'f'  => sb.append('\f')
              case 'n'  => sb.append('\n')
              case 'r'  => sb.append('\r')
              case 't'  => sb.append('\t')
              case 'u' =>
                if (i + 4 > s.length) err("truncated \\u escape")
                val hex = s.substring(i, i + 4)
                i += 4
                sb.append(Integer.parseInt(hex, 16).toChar)
              case other => err(s"bad escape '\\$other'")
            }
          case ch => sb.append(ch)
        }
      }
      sb.toString
    }

    private def substitution(): Any = {
      next(); next() // ${
      val optional = peek == '?'
      if (optional) next()
      val sb = new StringBuilder
      while (!eof && peek != '}') sb.append(next())
      if (eof) err("unterminated substitution")
      next() // }
      if (sb.isEmpty) err("empty substitution")
      Sub(sb.toString, optional)
    }

    private val IntRe = """[-+]?\d+""".r
    private val DblRe = """[-+]?(\d+\.\d*|\.\d+|\d+)([eE][-+]?\d+)?""".r

    private def unquoted(): Any = {
      val sb = new StringBuilder
      while (!eof && !",}]\n#".contains(peek)
        && !(peek == '/' && (peek2 == '/' || peek2 == '*'))
        && !(peek == '$' && peek2 == '{'))
        sb.append(next())
      val raw = sb.toString
      val trimmed = raw.trim
      if (trimmed.isEmpty) err("expected a value")
      trimmed match {
        case "true"            => true
        case "false"           => false
        case "null"            => null
        case IntRe()           =>
          try java.lang.Long.parseLong(trimmed): Any
          catch { case _: NumberFormatException => BigInt(trimmed) }
        case DblRe(_, _)       => trimmed.toDouble
        case _                 =>
          // keep trailing whitespace when a substitution follows on the
          // same line (it participates in the string concatenation)
          if (!eof && peek == '$' && peek2 == '{') raw else trimmed
      }
    }
  }
}

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** [[Hocon]] parser behavior: the JSON subset parses unchanged, the HOCON
  * conveniences the reference's configs use (unquoted keys, `=`, comments,
  * substitutions, concatenation, object merge) work, and every key path
  * gets a line number (feeds the `line N:` config-error prefixes).
  */
class HoconSpec extends AnyFunSuite {

  private def root(text: String): Map[String, Any] =
    Hocon.parse(text).fold(e => fail(e.toString), _.root)

  test("plain JSON parses unchanged") {
    val r = root("""{"a": 1, "b": [true, null, "x"], "c": {"d": 2.5}}""")
    assert(r("a") == 1L)
    assert(r("b") == List(true, null, "x"))
    assert(r("c") == Map("d" -> 2.5))
  }

  test("unquoted keys and values, '=', newline separators, comments") {
    val r = root("""
      // line comment
      # hash comment
      name = graft /* block
        comment */
      mode: Overwrite
      n = 3
      flag = true
      list = [a, b
              c]
    """)
    assert(r("name") == "graft")
    assert(r("mode") == "Overwrite")
    assert(r("n") == 3L && r("flag") == true)
    assert(r("list") == List("a", "b", "c"))
  }

  test("dotted bare keys nest; quoted keys stay literal") {
    val r = root("""
      a.b.c = 1
      params { "confirm.truncate" = "true" }
    """)
    assert(r("a") == Map("b" -> Map("c" -> 1L)))
    assert(r("params") == Map("confirm.truncate" -> "true"))
  }

  test("duplicate keys: objects deep-merge, scalars last-wins") {
    val r = root("""
      conn { host = a, port = 1 }
      conn { port = 2 }
      x = 1
      x = 2
    """)
    assert(r("conn") == Map("host" -> "a", "port" -> 2L))
    assert(r("x") == 2L)
  }

  test("substitutions resolve from the root; optional-missing drops the field") {
    val r = root("""
      base { table = part, keep = yes }
      t1 = ${base.table}
      t2 = ${?base.missing}
      nested { again = ${base.keep} }
    """)
    assert(r("t1") == "part")
    assert(!r.contains("t2"))
    assert(r("nested") == Map("again" -> "yes"))
  }

  test("string concatenation of adjacent same-line values") {
    val r = root("""
      host = example
      port = 9042
      url = ${host}":"${port}
      path = /data/ ${host}
    """)
    assert(r("url") == "example:9042")
    assert(r("path") == "/data/ example")
  }

  test("substitutions inside quoted strings are NOT resolved (SqlParams-safe)") {
    val r = root("""sql = "SELECT * FROM t WHERE x >= ${minsize}" """)
    assert(r("sql") == "SELECT * FROM t WHERE x >= ${minsize}")
  }

  test("key paths carry 1-based line numbers, through arrays") {
    val doc = Hocon.parse(
      """stages = [
        |  { type = Extract
        |    saveMode = Bogus }
        |]""".stripMargin).toOption.get
    assert(doc.lines("stages") == 1)
    assert(doc.lines("stages[0]") == 2)
    assert(doc.lines("stages[0].type") == 2)
    assert(doc.lines("stages[0].saveMode") == 3)
  }

  test("parse failures are Left with a line, never thrown") {
    assert(Hocon.parse("""a = "unterminated""").isLeft)
    assert(Hocon.parse("a = ${nope}").swap.toOption.get.message.contains("nope"))
    assert(Hocon.parse("a = ${b}\nb = ${a}").swap.toOption.get.message.contains("cycle"))
    val e = Hocon.parse("{\n  broken\n}").swap.toOption.get
    assert(e.message.startsWith("line 2:"), e.message)
  }

  test("+= appends to an existing array or creates one") {
    val r = root("""
      tags = [a]
      tags += b
      fresh += 1
      fresh += 2
      nested.xs += x
    """)
    assert(r("tags") == List("a", "b"))
    assert(r("fresh") == List(1L, 2L))
    assert(r("nested") == Map("xs" -> List("x")))
  }

  test("+= onto a non-array is a parse error, with a line") {
    val Left(err) = Hocon.parse("a = 1\na += 2"): @unchecked
    assert(err.message.contains("line 2") && err.message.contains("array"))
  }

  test("triple-quoted strings take no escapes; quote runs end at the last three") {
    val r = root("A = \"\"\"no \\n escape, \"quoted\", multi\nline\"\"\"\"")
    assert(r("A") == "no \\n escape, \"quoted\", multi\nline\"")
  }

  test("include merges with textual-substitution order, at root and nested") {
    val inc = java.nio.file.Files.createTempFile("graft_inc", ".conf")
    java.nio.file.Files.writeString(inc, "shared = 7\nconn { host = \"h1\" }\n")
    try {
      val Right(doc) = Hocon.parse(s"""
        before = 1
        shared = 0
        include "$inc"
        conn { port = 9042 }
        sub { include "$inc"
              shared = 42 }
      """): @unchecked
      val r = doc.root
      assert(r("before") == 1L)
      assert(r("shared") == 7L, "include overrides EARLIER keys")
      assert(r("conn") == Map("host" -> "h1", "port" -> 9042L),
        "included and local objects deep-merge")
      assert(r("sub") == Map("shared" -> 42L, "conn" -> Map("host" -> "h1")),
        "later keys override the include")
      // included-only keys anchor to the include statement's line (here 4)
      assert(doc.lines.get("conn.host").contains(4))
    } finally java.nio.file.Files.deleteIfExists(inc)
  }

  test("include of a missing file is a parse error with the offending line") {
    val Left(err) = Hocon.parse("a = 1\ninclude \"/nope/missing.conf\""): @unchecked
    assert(err.message.contains("line 2") && err.message.contains("missing.conf"))
  }

  test("`include` as an ordinary key still works; cycles are depth-capped") {
    val r = root("include = \"a-value\"\nok = true")
    assert(r("include") == "a-value" && r("ok") == true)
    val self = java.nio.file.Files.createTempFile("graft_cycle", ".conf")
    java.nio.file.Files.writeString(self, s"include \"$self\"\n")
    try {
      val Left(err) = Hocon.parse(s"""include "$self""""): @unchecked
      assert(err.message.contains("too deep"))
    } finally java.nio.file.Files.deleteIfExists(self)
  }
}

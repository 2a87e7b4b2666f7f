package graft.pipeline

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: the JSON subset of HOCON parses UNCHANGED — for any
  * generated JSON document, `Hocon.parse(render(doc)) == doc`. This pins
  * the parser against the whole space of nesting/escaping/number shapes,
  * not just the hand-picked examples in HoconSpec.
  */
class HoconPropertySpec extends AnyFunSuite {

  private val genKey: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  // any content is fair game once JSON-escaped (substitutions only parse
  // OUTSIDE quoted strings, so ${...} inside a string is literal)
  private val genStr: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', ' ', '$',
        '{', '}', '#', '/', '.', ':', '=')))).map(_.mkString)

  private val genLeaf: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2),
    // plain decimals only: the renderer emits BigDecimal plain strings
    Gen.chooseNum(-1000000L, 1000000L).map(n => n / 1000.0),
    Gen.oneOf(true, false),
    Gen.const(null),
    genStr)

  private def genValue(depth: Int): Gen[Any] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      6 -> genLeaf,
      2 -> Gen.chooseNum(0, 4).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1))),
      2 -> genObj(depth - 1))

  private def genObj(depth: Int): Gen[Map[String, Any]] =
    Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genKey, genValue(depth))).map(_.toMap))

  private def renderStr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  private def render(v: Any): String = v match {
    case null            => "null"
    case s: String       => renderStr(s)
    case d: Double       => BigDecimal(d).bigDecimal.toPlainString
    case m: Map[_, _]    => m.asInstanceOf[Map[String, Any]]
      .map { case (k, x) => s"${renderStr(k)}: ${render(x)}" }
      .mkString("{", ", ", "}")
    case xs: List[_]     => xs.map(render).mkString("[", ", ", "]")
    case other           => other.toString // Long, Boolean
  }

  // numbers normalize: the parser may return Long for whole doubles
  private def norm(v: Any): Any = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      .map { case (k, x) => k -> norm(x) }
    case xs: List[_]  => xs.map(norm)
    case d: Double if d.isWhole && math.abs(d) < 1e15 => d.toLong
    case other        => other
  }

  test("any generated JSON document round-trips through the parser") {
    val params = Gen.Parameters.default
    (1 to 300).foreach { n =>
      val doc = genObj(3)(params.withSize(8), rng.Seed(n.toLong))
        .getOrElse(Map.empty)
      val text = render(doc)
      Hocon.parse(text) match {
        case Right(parsed) =>
          assert(norm(parsed.root) == norm(doc),
            s"round-trip mismatch (seed $n) for:\n$text")
        case Left(err) =>
          fail(s"parse failed (seed $n): $err\nfor:\n$text")
      }
    }
  }
}

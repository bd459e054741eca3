package graft.util

/** Minimal JSON writer for manifests and reports (no external deps —
  * the build's unmanaged classpath is Spark-only). Output is compact,
  * key order is insertion order, strings are escaped per RFC 8259.
  */
object Jsons {

  def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Render any supported value: String, Boolean, numeric, None/null,
    * Option, Seq (array), Seq[(String, Any)] via [[obj]] only. */
  def value(v: Any): String = v match {
    case null | None   => "null"
    case Some(x)       => value(x)
    case s: String     => str(s)
    case b: Boolean    => b.toString
    case d: Double     => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float      => value(f.toDouble)
    case n: Number     => n.toString
    case raw: Raw      => raw.json
    case xs: Seq[_]    => xs.map(value).mkString("[", ",", "]")
    case other         => str(other.toString)
  }

  /** Pre-rendered JSON passed through verbatim (nested objects). */
  final case class Raw(json: String)

  def obj(fields: (String, Any)*): String =
    fields.map { case (k, v) => s"${str(k)}:${value(v)}" }.mkString("{", ",", "}")

  def arr(vs: Seq[Any]): String = vs.map(value).mkString("[", ",", "]")

  // ---- reader -------------------------------------------------------
  // The inverse of the writer: manifests are re-read by the build cache
  // probe and `catalog`, and regex field-plucking breaks on escaped
  // quotes/backslashes in values and on duplicate key suffixes
  // ("rows" vs "matched_rows"). Objects parse to Map[String, Any],
  // arrays to Vector[Any], numbers to Long when integral else Double.

  /** Parse a complete JSON document; None on any syntax error. */
  def parse(s: String): Option[Any] =
    try {
      val p = new Parser(s)
      val v = p.value()
      p.skipWs()
      if (p.eof) Some(v) else None
    } catch { case _: Exception => None }

  /** Parse a document whose root is an object. */
  def parseObject(s: String): Option[Map[String, Any]] =
    parse(s).collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }

  /** Navigate nested objects: path("output", "output_path"). */
  def at(root: Any, path: String*): Option[Any] =
    path.foldLeft(Option(root)) {
      case (Some(m: Map[_, _]), k) => m.asInstanceOf[Map[String, Any]].get(k)
      case _                       => None
    }.filter(_ != null)

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $i: $msg")
    private def expect(c: Char): Unit = {
      skipWs()
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def value(): Any = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }
    private def lit(tok: String, v: Any): Any =
      if (s.regionMatches(i, tok, 0, tok.length)) { i += tok.length; v }
      else fail(s"expected $tok")
    private def obj(): Map[String, Any] = {
      expect('{')
      val b = Map.newBuilder[String, Any]
      skipWs()
      if (!eof && s.charAt(i) == '}') { i += 1; return b.result() }
      var more = true
      while (more) {
        skipWs()
        val k = string()
        expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect('}'); more = false }
      }
      b.result()
    }
    private def arr(): Vector[Any] = {
      expect('[')
      val b = Vector.newBuilder[Any]
      skipWs()
      if (!eof && s.charAt(i) == ']') { i += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); more = false }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        s.charAt(i) match {
          case '"' => i += 1; return sb.toString
          case '\\' =>
            i += 1
            if (eof) fail("bad escape")
            s.charAt(i) match {
              case '"'  => sb.append('"'); i += 1
              case '\\' => sb.append('\\'); i += 1
              case '/'  => sb.append('/'); i += 1
              case 'n'  => sb.append('\n'); i += 1
              case 'r'  => sb.append('\r'); i += 1
              case 't'  => sb.append('\t'); i += 1
              case 'b'  => sb.append('\b'); i += 1
              case 'f'  => sb.append('\f'); i += 1
              case 'u' =>
                if (i + 5 > s.length) fail("bad \\u escape")
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
                i += 5
              case c => fail(s"bad escape \\$c")
            }
          case c => sb.append(c); i += 1
        }
      }
      sb.toString // unreachable
    }
    private def number(): Any = {
      val start = i
      if (!eof && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (!eof && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) fail("expected value")
      val tok = s.substring(start, i)
      if (tok.forall(c => c.isDigit || c == '-'))
        try tok.toLong catch { case _: NumberFormatException => tok.toDouble }
      else tok.toDouble
    }
  }
}

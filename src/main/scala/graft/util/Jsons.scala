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
}

package graft.util

import scala.collection.mutable

/** Minimal YAML-subset parser for the CLI config file (`graft.yaml`) —
  * the build has zero external dependencies, so this supports exactly
  * the subset the config schema needs (mirroring the reference's
  * `timefence.yaml`, docs/reference/configuration.md):
  *
  *   - nested maps via 2-space indentation
  *   - block lists (`- item` / `- key: value` maps)
  *   - inline lists `[a, b, c]`
  *   - scalars (quoted or bare; `#` comments; blank lines)
  *
  * Values are returned as `Any`: Map[String, Any], List[Any], String.
  */
object MiniYaml {

  def parse(text: String): Map[String, Any] = {
    val lines = text.linesIterator
      .map(stripComment)
      .zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty }
      .toVector
    val (m, rest) = parseMap(lines, 0, 0)
    require(rest >= lines.length, s"Trailing content at line ${lines(rest)._2 + 1}")
    m
  }

  private def stripComment(l: String): String = {
    // drop from an unquoted '#'. A quote only OPENS a string when it
    // starts a token (line start, or after whitespace/':'/'-'/',') —
    // otherwise an apostrophe inside a bare scalar ("don't") would flip
    // the state and a trailing '# comment' would survive into the value.
    var inS = false; var inD = false
    var prev = ' '
    val sb = new StringBuilder
    def atTokenStart: Boolean =
      prev == ' ' || prev == '\t' || prev == ':' || prev == '-' || prev == ','
    for (c <- l) {
      if (c == '\'' && !inD && (inS || atTokenStart)) inS = !inS
      else if (c == '"' && !inS && (inD || atTokenStart)) inD = !inD
      if (c == '#' && !inS && !inD) return sb.toString
      sb.append(c)
      prev = c
    }
    sb.toString
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  private def parseMap(lines: Vector[(String, Int)], start: Int,
      indent: Int): (Map[String, Any], Int) = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var i = start
    while (i < lines.length) {
      val (line, lineNo) = lines(i)
      val ind = indentOf(line)
      if (ind < indent) return (out.toMap, i)
      require(ind == indent, s"Bad indentation at line ${lineNo + 1}: '$line'")
      val t = line.trim
      require(!t.startsWith("- "), s"Unexpected list item at line ${lineNo + 1}")
      val colon = t.indexOf(':')
      require(colon > 0, s"Expected 'key: value' at line ${lineNo + 1}: '$t'")
      val key = t.substring(0, colon).trim
      val value = t.substring(colon + 1).trim
      if (value.nonEmpty) {
        out(key) = parseScalar(value)
        i += 1
      } else {
        // nested block: map or list
        if (i + 1 < lines.length && indentOf(lines(i + 1)._1) > indent) {
          val childIndent = indentOf(lines(i + 1)._1)
          if (lines(i + 1)._1.trim.startsWith("- ")) {
            val (lst, next) = parseList(lines, i + 1, childIndent)
            out(key) = lst; i = next
          } else {
            val (m, next) = parseMap(lines, i + 1, childIndent)
            out(key) = m; i = next
          }
        } else { out(key) = Map.empty[String, Any]; i += 1 }
      }
    }
    (out.toMap, i)
  }

  private def parseList(lines: Vector[(String, Int)], start: Int,
      indent: Int): (List[Any], Int) = {
    val out = mutable.ListBuffer.empty[Any]
    var i = start
    while (i < lines.length) {
      val (line, lineNo) = lines(i)
      val ind = indentOf(line)
      if (ind < indent || !line.trim.startsWith("-")) return (out.toList, i)
      require(ind == indent, s"Bad list indentation at line ${lineNo + 1}")
      val body = line.trim.stripPrefix("-").trim
      // a list item is a MAP only when the colon ends the line or is
      // followed by a space (YAML's own rule) — `- a:b` and
      // `- s3://bucket/x` are scalar strings, not Map("a" -> "b")
      val mapColon = body.indexOf(": ") match {
        case -1 => if (body.endsWith(":")) body.length - 1 else -1
        case i  => i
      }
      if (mapColon >= 0) {
        // list item is a map: first pair inline, following pairs at indent+2
        val colon = mapColon
        val k = body.substring(0, colon).trim
        val v = body.substring(colon + 1).trim
        val itemIndent = ind + 2
        val head: Map[String, Any] =
          if (v.nonEmpty) Map(k -> parseScalar(v))
          else if (i + 1 < lines.length && indentOf(lines(i + 1)._1) > itemIndent &&
            lines(i + 1)._1.trim.startsWith("- ")) {
            val (lst, next) = parseList(lines, i + 1, indentOf(lines(i + 1)._1))
            i = next - 1
            Map(k -> lst)
          } else Map(k -> Map.empty[String, Any])
        val (tail, next) =
          if (i + 1 < lines.length && indentOf(lines(i + 1)._1) == itemIndent &&
            !lines(i + 1)._1.trim.startsWith("- "))
            parseMap(lines, i + 1, itemIndent)
          else (Map.empty[String, Any], i + 1)
        out += (head ++ tail)
        i = next
      } else {
        out += parseScalar(body)
        i += 1
      }
    }
    (out.toList, i)
  }

  private[util] def parseScalar(s: String): Any = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) List.empty[Any]
      else inner.split(",").map(x => unquote(x.trim)).toList
    } else unquote(t)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}

package graft.report

import scala.collection.mutable

/** Minimal TOML subset codec (no external deps — the build is zero-egress):
  * tables, string/number/boolean scalars, homogeneous arrays. Covers the
  * reference's query-state export format (query/query_export.py:49–181),
  * which uses exactly this subset.
  */
object Toml {

  sealed trait Value
  final case class Str(v: String) extends Value
  final case class Num(v: Double) extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Arr(v: Seq[Value]) extends Value
  final case class Tbl(v: Map[String, Value]) extends Value
  /** Array of tables — TOML `[[name]]` sections. */
  final case class TblArr(v: Seq[Map[String, Value]]) extends Value

  // ---------- rendering ----------

  private def renderScalar(v: Value): String = v match {
    case Str(s) => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case Num(d) => if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString else d.toString
    case Bool(b) => b.toString
    case Arr(xs) => xs.map(renderScalar).mkString("[", ", ", "]")
    case Tbl(_) => throw new IllegalArgumentException("inline tables not supported")
  }

  /** Renders a two-level document: top-level scalars first, then [table] /
    * [[table-array]] sections (sorted for determinism). */
  def render(doc: Map[String, Value]): String = {
    val sb = new StringBuilder
    val sorted = doc.toSeq.sortBy(_._1)
    sorted.collect { case (k, v) if !v.isInstanceOf[Tbl] && !v.isInstanceOf[TblArr] =>
      sb.append(s"$k = ${renderScalar(v)}\n")
    }
    sorted.foreach {
      case (name, Tbl(fields)) =>
        sb.append(s"\n[$name]\n")
        fields.toSeq.sortBy(_._1).foreach { case (k, v) =>
          sb.append(s"$k = ${renderScalar(v)}\n")
        }
      case (name, TblArr(items)) =>
        items.foreach { fields =>
          sb.append(s"\n[[$name]]\n")
          fields.toSeq.sortBy(_._1).foreach { case (k, v) =>
            sb.append(s"$k = ${renderScalar(v)}\n")
          }
        }
      case _ => ()
    }
    sb.toString
  }

  // ---------- parsing ----------

  def parse(text: String): Map[String, Value] = {
    val root = mutable.LinkedHashMap[String, Value]()
    val tableAcc = mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, Value]]()
    val arrAcc = mutable.LinkedHashMap[String, mutable.ArrayBuffer[mutable.LinkedHashMap[String, Value]]]()
    var current: Option[mutable.LinkedHashMap[String, Value]] = None

    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("[[") && line.endsWith("]]")) {
        val name = line.substring(2, line.length - 2).trim
        val entry = mutable.LinkedHashMap[String, Value]()
        arrAcc.getOrElseUpdate(name, mutable.ArrayBuffer()) += entry
        current = Some(entry)
      } else if (line.startsWith("[") && line.endsWith("]")) {
        val name = line.substring(1, line.length - 1).trim
        val t = tableAcc.getOrElseUpdate(name, mutable.LinkedHashMap())
        current = Some(t)
      } else {
        val eq = indexOfUnquoted(line, '=')
        require(eq > 0, s"Malformed TOML line: $line")
        val key = unquoteKey(line.substring(0, eq).trim)
        val value = parseValue(line.substring(eq + 1).trim)
        current match {
          case Some(t) => t(key) = value
          case None    => root(key) = value
        }
      }
    }
    (root ++
      tableAcc.map { case (k, v) => k -> Tbl(v.toMap) } ++
      arrAcc.map { case (k, v) => k -> TblArr(v.map(_.toMap).toSeq) }).toMap
  }

  private def stripComment(line: String): String = {
    var inStr = false
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && (i == 0 || line.charAt(i - 1) != '\\')) inStr = !inStr
      if (c == '#' && !inStr) return sb.toString
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def indexOfUnquoted(s: String, target: Char): Int = {
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) inStr = !inStr
      else if (c == target && !inStr) return i
      i += 1
    }
    -1
  }

  private def unquoteKey(k: String): String =
    if (k.startsWith("\"") && k.endsWith("\"")) unescape(k.substring(1, k.length - 1)) else k

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseValue(raw: String): Value = {
    val s = raw.trim
    if (s.startsWith("\"")) Str(unescape(s.substring(1, s.length - 1)))
    else if (s == "true") Bool(true)
    else if (s == "false") Bool(false)
    else if (s.startsWith("[")) {
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Arr(Seq.empty)
      else Arr(splitTopLevel(inner).map(parseValue))
    }
    else Num(s.toDouble)
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val parts = mutable.ArrayBuffer[String]()
    var depth = 0; var inStr = false
    val sb = new StringBuilder
    s.foreach {
      case '"' => inStr = !inStr; sb.append('"')
      case '[' if !inStr => depth += 1; sb.append('[')
      case ']' if !inStr => depth -= 1; sb.append(']')
      case ',' if !inStr && depth == 0 => parts += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) parts += sb.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

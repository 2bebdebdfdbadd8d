package graft.spec

import scala.collection.immutable.ListMap

/** Minimal JSON AST with a *canonical* renderer and a recursive-descent
  * parser. Zero dependencies so the spec layer stays pure Scala (usable off
  * the Spark driver, e.g. in CLI tooling).
  *
  * Canonical form (frozen — golden-hash tests in `OpSpecSpec` break on any
  * drift, the same discipline as the reference's UUID goldens, reference
  * `tests/test_graph.py:32-54`):
  *   - object keys sorted lexicographically
  *   - compact separators (`,` and `:`, no whitespace)
  *   - integers rendered without a decimal point; doubles via
  *     `java.lang.Double.toString`
  *   - strings escaped per RFC 8259 (control chars as \u00XX)
  */
sealed trait JValue {
  def render: String = Json.render(this)
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JLong(value: Long) extends JValue
final case class JDouble(value: Double) extends JValue
final case class JString(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
final case class JObj(fields: ListMap[String, JValue]) extends JValue {
  def apply(name: String): JValue = fields.getOrElse(name,
    throw new NoSuchElementException(s"missing JSON field '$name'"))
  def get(name: String): Option[JValue] = fields.get(name)
}

object JObj {
  def apply(fields: (String, JValue)*): JObj = JObj(ListMap(fields: _*))
}

object Json {

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Canonical compact rendering: sorted keys, no whitespace. */
  def render(v: JValue): String = v match {
    case JNull => "null"
    case JBool(b) => if (b) "true" else "false"
    case JLong(n) => n.toString
    case JDouble(d) =>
      if (d.isNaN) "\"NaN\""
      else if (d.isPosInfinity) "\"Infinity\""
      else if (d.isNegInfinity) "\"-Infinity\""
      else java.lang.Double.toString(d)
    case JString(s) => escape(s)
    case JArr(items) => items.map(render).mkString("[", ",", "]")
    case JObj(fields) =>
      fields.toSeq.sortBy(_._1)
        .map { case (k, x) => escape(k) + ":" + render(x) }
        .mkString("{", ",", "}")
  }

  /** Pretty rendering for status files / CLI output (keys kept sorted so
    * files diff cleanly). */
  def renderPretty(v: JValue, indent: Int = 0): String = {
    val pad = "  " * indent
    val pad1 = "  " * (indent + 1)
    v match {
      case JArr(items) if items.nonEmpty =>
        items.map(x => pad1 + renderPretty(x, indent + 1).dropWhile(_ == ' '))
          .mkString("[\n", ",\n", s"\n$pad]")
      case JObj(fields) if fields.nonEmpty =>
        fields.toSeq.sortBy(_._1)
          .map { case (k, x) => s"$pad1${escape(k)}: ${renderPretty(x, indent + 1)}" }
          .mkString("{\n", ",\n", s"\n$pad}")
      case other => render(other)
    }
  }

  // ---------------- parser ----------------

  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new IllegalArgumentException(
      s"trailing content at offset ${p.pos}: '${s.drop(p.pos).take(20)}'")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\t')) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def parseValue(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JString(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _ => parseNumber()
      }
    }

    private def literal(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) fail(s"expected $lit")
      pos += lit.length
    }

    private def parseObj(): JObj = {
      expect('{'); skipWs()
      val buf = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObj(ListMap.empty[String, JValue]) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        val v = parseValue()
        buf += ((k, v))
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(ListMap(buf.toSeq: _*))
    }

    private def parseArr(): JArr = {
      expect('['); skipWs()
      val buf = Vector.newBuilder[JValue]
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArr(Vector.empty) }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(buf.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(pos); pos += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            if (atEnd) fail("unterminated escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                if (pos + 4 > s.length) fail("bad \\u escape")
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case other => fail(s"bad escape \\$other")
            }
          case other => sb.append(other)
        }
      }
      sb.toString // unreachable
    }

    private def parseNumber(): JValue = {
      val start = pos
      if (!atEnd && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var isFloat = false
      while (!atEnd && (s.charAt(pos).isDigit || s.charAt(pos) == '.' ||
        s.charAt(pos) == 'e' || s.charAt(pos) == 'E' ||
        s.charAt(pos) == '-' || s.charAt(pos) == '+')) {
        if (s.charAt(pos) == '.' || s.charAt(pos) == 'e' || s.charAt(pos) == 'E')
          isFloat = true
        pos += 1
      }
      val text = s.substring(start, pos)
      if (text.isEmpty) fail("expected number")
      if (isFloat) JDouble(text.toDouble) else JLong(text.toLong)
    }
  }

  // ---------------- Scala value bridge ----------------

  /** Convert a restricted Scala value (primitives, Option, Seq, Map[String,_])
    * to JSON. OpSpec handling is layered on top in `OpSpec.valueToJson`.
    */
  def fromScala(v: Any): JValue = v match {
    case null => JNull
    case None => JNull
    case Some(x) => fromScala(x)
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case s: Short => JLong(s.toLong)
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case m: scala.collection.Map[_, _] =>
      JObj(ListMap(m.toSeq.map { case (k, x) => (k.toString, fromScala(x)) }
        .sortBy(_._1): _*))
    case xs: Iterable[_] => JArr(xs.map(fromScala).toVector)
    case other => throw new IllegalArgumentException(
      s"not JSON-serializable: $other (${other.getClass.getName})")
  }

  /** JSON → plain Scala values (inverse of fromScala; objects → ListMap). */
  def toScala(v: JValue): Any = v match {
    case JNull => null
    case JBool(b) => b
    case JLong(n) => n
    case JDouble(d) => d
    case JString(s) => s
    case JArr(items) => items.map(toScala)
    case JObj(fields) => fields.map { case (k, x) => (k, toScala(x)) }
  }
}

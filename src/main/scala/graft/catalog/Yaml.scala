package graft.catalog

import scala.collection.immutable.ListMap

/** Minimal offline YAML-subset parser — just enough of YAML 1.1 to
  * load the reference's configuration surface (datasets/registry.yaml
  * and the per-dataset config.yaml files, settings.py:44-78) with
  * ZERO dependencies (the sandbox has no snakeyaml and no egress).
  *
  * Supported subset (everything those files actually use):
  *   - block mappings nested by indentation
  *   - block sequences of scalars (`- item`)
  *   - inline sequences of scalars (`["a", "b"]` / `[1, 2]`)
  *   - scalars: single/double-quoted strings, unquoted strings,
  *     integers, floats, booleans (`true`/`false`), `null`/`~`
  *   - `#` comments (full-line and trailing, quote-aware) and blank
  *     lines
  *
  * NOT supported (and rejected loudly rather than misparsed): flow
  * mappings, anchors/aliases, multi-line scalars (`|`/`>`), tabs in
  * indentation, documents (`---`), block sequences nested inside a
  * sequence-of-mappings item, and quoted KEYS in sequence-of-mapping
  * items (a quote-leading item is always parsed as a scalar, so
  * `- "a: b"` is the string "a: b", never a one-key mapping).
  *
  * Deliberate divergence from YAML 1.1 octals: an unquoted multi-digit
  * integer with a leading zero (`010`, `089`) stays a STRING here —
  * PyYAML would octal-parse `010` to 8 and keep `089` (failed octal) a
  * string; we keep both strings so identifiers like zip codes survive
  * unquoted. Parsed mappings preserve key order
  * (ListMap) so generated schemas keep the declared column order —
  * the same property the reference gets from Python 3.7+ dicts.
  */
object Yaml {

  type YMap = ListMap[String, Any]

  def parse(text: String): YMap = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (raw, i) => (stripComment(raw), i + 1) }
      .filter { case (l, _) => l.trim.nonEmpty }
      .toVector
    lines.foreach { case (l, n) =>
      require(!l.startsWith("\t"), s"line $n: tab indentation is not YAML")
      require(l.trim != "---", s"line $n: multi-document YAML unsupported")
    }
    val (m, rest) = parseMapping(lines, 0, indentOf(lines.headOption.map(_._1).getOrElse("")))
    require(rest.isEmpty, s"line ${rest.head._2}: trailing content outdented past document root")
    m
  }

  def parseFile(path: String): YMap =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  /** Quote-aware trailing-comment strip: a `#` only starts a comment
    * outside quotes and (per YAML) when preceded by start-of-line or
    * whitespace.
    */
  private def stripComment(l: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == '#' && !inS && !inD && (i == 0 || l.charAt(i - 1).isWhitespace))
        return l.substring(0, i)
      i += 1
    }
    l
  }

  private type Lines = Vector[(String, Int)]

  private def parseMapping(lines: Lines, from: Int, indent: Int): (YMap, Lines) = {
    var m = ListMap.empty[String, Any]
    var i = from
    while (i < lines.length && indentOf(lines(i)._1) == indent &&
           !lines(i)._1.trim.startsWith("- ")) {
      val (line, n) = lines(i)
      val body = line.trim
      val colon = colonIndex(body, n)
      val key = unquote(body.substring(0, colon).trim)
      val rhs = body.substring(colon + 1).trim
      if (rhs.nonEmpty) {
        m = m.updated(key, scalarOrInlineSeq(rhs, n))
        i += 1
      } else {
        // value is the following deeper-indented block (mapping or
        // sequence); an immediately-outdented next line means null
        val childOpt = lines.lift(i + 1)
        childOpt match {
          case Some((cl, _)) if indentOf(cl) > indent =>
            val ci = indentOf(cl)
            if (cl.trim.startsWith("- ")) {
              val (seq, rest) = parseSeq(lines, i + 1, ci)
              m = m.updated(key, seq)
              i = lines.length - rest.length
            } else {
              val (child, rest) = parseMapping(lines, i + 1, ci)
              m = m.updated(key, child)
              i = lines.length - rest.length
            }
          case _ =>
            m = m.updated(key, null)
            i += 1
        }
      }
    }
    require(i >= lines.length || indentOf(lines(i)._1) <= indent,
      s"line ${lines(i)._2}: unexpected deeper indentation")
    (m, lines.drop(i))
  }

  private def parseSeq(lines: Lines, from: Int, indent: Int): (Seq[Any], Lines) = {
    val out = Vector.newBuilder[Any]
    var i = from
    while (i < lines.length && indentOf(lines(i)._1) == indent &&
           lines(i)._1.trim.startsWith("- ")) {
      val (line, n) = lines(i)
      val item = line.trim.stripPrefix("- ").trim
      // a quote-leading item is a scalar even if it contains ": " —
      // `- "a: b"` is the string "a: b" (quoted keys in mapping items
      // are outside the subset, per the header)
      val quoted = item.startsWith("\"") || item.startsWith("'")
      if (!quoted && (item.contains(": ") || item.endsWith(":"))) {
        // sequence of mappings (`- name: x` + continuation lines at the
        // item's indent): rewrite the dash as indentation and parse the
        // item as a mapping whose keys sit at indent + 2
        val itemIndent = indent + 2
        var j = i + 1
        while (j < lines.length && indentOf(lines(j)._1) >= itemIndent &&
               !lines(j)._1.trim.startsWith("- ")) j += 1
        val itemLines = ((" " * itemIndent) + item, n) +:
          lines.slice(i + 1, j)
        val (m, rest) = parseMapping(itemLines, 0, itemIndent)
        require(rest.isEmpty,
          s"line $n: malformed mapping item in sequence")
        out += m
        i = j
      } else {
        out += scalarOrInlineSeq(item, n)
        i += 1
      }
    }
    (out.result(), lines.drop(i))
  }

  /** First colon that terminates the key (outside quotes, followed by
    * space or end-of-line — `http://…` in a value never splits).
    */
  private def colonIndex(body: String, lineNo: Int): Int = {
    var inS = false; var inD = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == ':' && !inS && !inD &&
               (i + 1 >= body.length || body.charAt(i + 1) == ' '))
        return i
      i += 1
    }
    throw new IllegalArgumentException(
      s"line $lineNo: expected 'key: value' or 'key:', got '$body'")
  }

  private def scalarOrInlineSeq(s: String, lineNo: Int): Any =
    if (s.startsWith("[")) {
      require(s.endsWith("]"), s"line $lineNo: unterminated inline sequence")
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Vector.empty[Any]
      else splitTopLevel(inner).map(x => scalar(x.trim)).toVector
    } else if (s == "{}") ListMap.empty[String, Any]
    else if (s.startsWith("{"))
      throw new IllegalArgumentException(
        s"line $lineNo: non-empty flow mappings are outside the supported subset")
    else if (s == "|" || s == ">" || s.startsWith("&") || s.startsWith("*"))
      throw new IllegalArgumentException(
        s"line $lineNo: block scalars / anchors are outside the supported subset")
    else scalar(s)

  /** Comma split outside quotes (inline sequences of quoted strings). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inS = false; var inD = false
    s.foreach { c =>
      if (c == '\'' && !inD) { inS = !inS; cur += c }
      else if (c == '"' && !inS) { inD = !inD; cur += c }
      else if (c == ',' && !inS && !inD) { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.result()
  }

  private val IntRe = """[-+]?\d+""".r
  private val FloatRe = """[-+]?(\d+\.\d*|\.\d+|\d+)([eE][-+]?\d+)?""".r

  private def scalar(s: String): Any = s match {
    case "" | "null" | "~" | "Null" | "NULL" => null
    case "true" | "True" | "TRUE" => true
    case "false" | "False" | "FALSE" => false
    case q if (q.startsWith("\"") && q.endsWith("\"") && q.length >= 2) ||
              (q.startsWith("'") && q.endsWith("'") && q.length >= 2) => unquote(q)
    // leading-zero multi-digit integers stay strings (see header: zip
    // codes; deliberate divergence from YAML 1.1 octal parsing)
    case IntRe() if { val d = s.dropWhile(c => c == '+' || c == '-')
                      d.length > 1 && d.charAt(0) == '0' } => s
    case IntRe() => s.toLong
    case FloatRe(_, _) if s.exists(c => c == '.' || c == 'e' || c == 'E') => s.toDouble
    case other => other
  }

  private def unquote(s: String): String =
    if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
      s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      s.substring(1, s.length - 1).replace("''", "'")
    else s

  // ---- typed accessors for config consumers ----

  def str(m: YMap, key: String): Option[String] =
    m.get(key).collect { case s: String => s }
  def bool(m: YMap, key: String): Option[Boolean] =
    m.get(key).collect { case b: Boolean => b }
  def long(m: YMap, key: String): Option[Long] = m.get(key).collect {
    case l: Long => l
    case d: Double if d.isWhole => d.toLong
  }
  def dbl(m: YMap, key: String): Option[Double] = m.get(key).collect {
    case d: Double => d
    case l: Long => l.toDouble
  }
  def map(m: YMap, key: String): Option[YMap] =
    m.get(key).collect { case mm: ListMap[_, _] => mm.asInstanceOf[YMap] }
  def seq(m: YMap, key: String): Option[Seq[Any]] =
    m.get(key).collect { case s: Seq[_] => s }
  def strSeq(m: YMap, key: String): Option[Seq[String]] =
    seq(m, key).map(_.collect { case s: String => s })
}

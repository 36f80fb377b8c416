package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** TOML manifest parse — the code-corpus dependency channel reads
  * package.json via `from_json` but a code crawl hits Cargo.toml /
  * pyproject.toml just as often. Scope (stated, reject-not-misparse
  * on everything else): `[table]` headers (bare dotted segments),
  * `key = value` with basic `"…"` strings (standard short escapes +
  * \uXXXX), literal `'…'` strings, integers (sign + `_` separators),
  * booleans, and single-line arrays of those scalars. Out of scope —
  * the WHOLE FILE returns None rather than a half-read manifest:
  * multiline strings, dotted keys, inline tables, arrays of tables
  * `[[t]]`, dates, floats, duplicate keys (a TOML error). Comments
  * and blank lines are stripped; `#` inside a string is content.
  */
object Toml {

  final case class TomlKv(table: String, key: String, value: String,
                          kind: String)

  private val BareKey = "[A-Za-z0-9_-]+".r

  /** Parse one scalar token; (canonical value, kind) or None. */
  private def scalar(t0: String): Option[(String, String)] = {
    val t = t0.trim
    if (t.isEmpty) return None
    if (t.startsWith("\"")) {
      // basic string with escapes; must close exactly at the end
      if (t.length < 2 || !t.endsWith("\"")) return None
      val body = t.substring(1, t.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == '"') return None // unescaped quote inside
        else if (c == '\\') {
          if (i + 1 >= body.length) return None
          body.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'r' => sb += '\r'; i += 2
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case 'u' =>
              if (i + 6 > body.length) return None
              val hex = body.substring(i + 2, i + 6)
              if (!hex.forall(h => h.isDigit ||
                (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F')))
                return None
              sb += Integer.parseInt(hex, 16).toChar; i += 6
            case _ => return None // unknown escape
          }
        } else { sb += c; i += 1 }
      }
      Some((sb.result(), "string"))
    } else if (t.startsWith("'")) {
      if (t.length < 2 || !t.endsWith("'")) return None
      val body = t.substring(1, t.length - 1)
      if (body.contains("'")) return None
      Some((body, "string"))
    } else if (t == "true" || t == "false") {
      Some((t, "bool"))
    } else if (t.matches("[+-]?[0-9](_?[0-9])*")) {
      val n = t.replace("_", "")
      val v = try java.lang.Long.parseLong(n)
      catch { case _: NumberFormatException => return None }
      Some((v.toString, "int"))
    } else None // floats, dates, inline tables, …: out of scope
  }

  /** Split a single-line array body on TOP-LEVEL commas (commas
    * inside quoted strings are content). */
  private def splitArray(body: String): Option[Seq[String]] = {
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var q: Char = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (q != 0) {
        cur += c
        if (c == '\\' && q == '"' && i + 1 < body.length) {
          cur += body.charAt(i + 1); i += 1
        } else if (c == q) q = 0
      } else c match {
        case '"' | '\'' => q = c; cur += c
        case ',' => parts += cur.result(); cur.clear()
        case '[' | ']' => return None // nested arrays: out of scope
        case x => cur += x
      }
      i += 1
    }
    if (q != 0) return None // unterminated string
    val last = cur.result()
    // a single trailing comma is valid TOML; empty middles are not
    val all = parts.result() ++
      (if (last.trim.nonEmpty) Vector(last) else Vector.empty)
    Some(all)
  }

  /** Strip a trailing comment from a VALUE expression, respecting
    * quoted strings. Returns None on an unterminated string. */
  private def stripComment(v: String): Option[String] = {
    var i = 0
    var q: Char = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (q != 0) {
        if (c == '\\' && q == '"' && i + 1 < v.length) i += 1
        else if (c == q) q = 0
      } else c match {
        case '"' | '\'' => q = c
        case '#' => return Some(v.substring(0, i))
        case _ => ()
      }
      i += 1
    }
    if (q != 0) None else Some(v)
  }

  def parseToml(s: String): Option[Seq[TomlKv]] = {
    if (s == null) return None
    val out = Vector.newBuilder[TomlKv]
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    var table = "" // the root table
    val lines = s.split("\n", -1)
    var li = 0
    while (li < lines.length) {
      val raw = lines(li).stripSuffix("\r")
      li += 1
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) ()
      else if (line.startsWith("[[")) return None // array of tables
      else if (line.startsWith("[")) {
        if (!line.endsWith("]")) return None
        val name = line.substring(1, line.length - 1).trim
        val segs = name.split("\\.", -1).map(_.trim)
        if (segs.isEmpty ||
          !segs.forall(g => BareKey.pattern.matcher(g).matches()))
          return None
        table = segs.mkString(".")
      } else {
        val eq = line.indexOf('=')
        if (eq <= 0) return None
        val keyRaw = line.substring(0, eq).trim
        // quoted keys allowed (cargo features use them); dotted bare
        // keys are out of scope
        val key =
          if (keyRaw.startsWith("\"") && keyRaw.endsWith("\"") &&
            keyRaw.length >= 2)
            keyRaw.substring(1, keyRaw.length - 1)
          else if (BareKey.pattern.matcher(keyRaw).matches()) keyRaw
          else return None
        val vExpr = stripComment(line.substring(eq + 1))
          .getOrElse(return None).trim
        if (vExpr.isEmpty) return None
        val (value, kind) =
          if (vExpr.startsWith("[")) {
            if (!vExpr.endsWith("]")) return None // multiline array
            val items = splitArray(vExpr.substring(1, vExpr.length - 1))
              .getOrElse(return None)
            val parsed = items.map(x => scalar(x).getOrElse(return None))
            (parsed.map(_._1).mkString(","), "array")
          } else scalar(vExpr).getOrElse(return None)
        if (!seen.add((table, key))) return None // duplicate key
        out += TomlKv(table, key, value, kind)
      }
    }
    Some(out.result())
  }

  def parseTomlCol(c: Column): Column =
    udf { s: String => parseToml(s) }.apply(c)
}

package graft.text

/** Minimal tag-scanning helpers shared by the XML-shaped crawl
  * surfaces ([[Sitemap]], [[Feeds]]). Deliberately NOT an XML parser —
  * exactly the attribute-tolerant tag location, first-element-text
  * extraction, and attribute lookup those formats need, with CDATA
  * unwrapping and character-reference decoding delegated to
  * [[Html.decodeEntities]]. Exotic XML (namespace prefixes on tags,
  * nested CDATA, processing-instruction tricks) is out of documented
  * scope for every caller.
  */
private[graft] object XmlLite {

  /** Start index of `<tag>` or `<tag ...>` (attribute-tolerant, also
    * matches the self-closing form `<tag .../>`). */
  def indexOfTag(xml: String, tag: String, from: Int): Int = {
    var i = xml.indexOf(s"<$tag", from)
    while (i >= 0) {
      val after = i + tag.length + 1
      if (after < xml.length &&
        (xml.charAt(after) == '>' || xml.charAt(after) == '/' ||
          xml.charAt(after).isWhitespace))
        return i
      i = xml.indexOf(s"<$tag", i + 1)
    }
    -1
  }

  /** Inner text of the first `<name>` element at or after `from`:
    * trimmed, CDATA unwrapped, entities decoded. */
  def element(body: String, name: String, from: Int = 0): Option[String] = {
    val open = indexOfTag(body, name, from)
    if (open < 0) return None
    val contentStart = body.indexOf('>', open) + 1
    if (contentStart == 0) return None
    val close = body.indexOf(s"</$name>", contentStart)
    if (close < 0) return None
    val raw = body.substring(contentStart, close).trim
    val unwrapped =
      if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
        raw.substring(9, raw.length - 3)
      else Html.decodeEntities(raw)
    Some(unwrapped.trim)
  }

  /** Value of `name="..."` / `name='...'` inside a tag's inner text
    * (the part between `<` and `>`), entity-decoded. Matching is
    * case-insensitive on BOTH sides (attribute names are
    * case-insensitive in HTML and mixed-case in the wild: viewBox). */
  def attr(tagInner: String, name: String): Option[String] = {
    val lower = tagInner.toLowerCase
    val needle = name.toLowerCase
    var at = lower.indexOf(needle)
    while (at >= 0) {
      val beforeOk = at > 0 && lower.charAt(at - 1).isWhitespace
      var j = at + name.length
      while (j < tagInner.length && tagInner.charAt(j).isWhitespace) j += 1
      if (beforeOk && j < tagInner.length && tagInner.charAt(j) == '=') {
        j += 1
        while (j < tagInner.length && tagInner.charAt(j).isWhitespace) j += 1
        if (j >= tagInner.length) return None
        val q = tagInner.charAt(j)
        if (q == '"' || q == '\'') {
          val close = tagInner.indexOf(q, j + 1)
          val raw = if (close < 0) tagInner.substring(j + 1)
            else tagInner.substring(j + 1, close)
          return Some(Html.decodeEntities(raw))
        }
        return Some(Html.decodeEntities(
          tagInner.substring(j).takeWhile(!_.isWhitespace)))
      }
      at = lower.indexOf(needle, at + name.length)
    }
    None
  }
}

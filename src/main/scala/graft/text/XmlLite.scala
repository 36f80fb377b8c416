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
    // Tokenize left-to-right so a name=value sequence INSIDE another
    // attribute's quoted value never matches (e.g.
    // <link title="x rel=canonical" href=...> must not read as
    // rel=canonical). The first token is the tag name and is skipped.
    val n = tagInner.length
    var i = 0
    while (i < n && !tagInner.charAt(i).isWhitespace) i += 1 // tag name
    while (i < n) {
      while (i < n && tagInner.charAt(i).isWhitespace) i += 1
      if (i >= n) return None
      val nameStart = i
      while (i < n && !tagInner.charAt(i).isWhitespace &&
        tagInner.charAt(i) != '=') i += 1
      val attrName = tagInner.substring(nameStart, i)
      while (i < n && tagInner.charAt(i).isWhitespace) i += 1
      if (i < n && tagInner.charAt(i) == '=') {
        i += 1
        while (i < n && tagInner.charAt(i).isWhitespace) i += 1
        if (i >= n) return None
        val q = tagInner.charAt(i)
        val (raw, next) =
          if (q == '"' || q == '\'') {
            val close = tagInner.indexOf(q, i + 1)
            if (close < 0) (tagInner.substring(i + 1), n)
            else (tagInner.substring(i + 1, close), close + 1)
          } else {
            var j = i
            while (j < n && !tagInner.charAt(j).isWhitespace) j += 1
            (tagInner.substring(i, j), j)
          }
        if (attrName.equalsIgnoreCase(name))
          return Some(Html.decodeEntities(raw))
        i = next
      } else if (attrName.isEmpty) i += 1 // stray char: keep advancing
      // bare attribute (no '='): never a match here; loop continues
    }
    None
  }
}

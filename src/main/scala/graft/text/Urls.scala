package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** URL canonicalization + registrable-domain extraction — the crawl
  * pipeline stage BEFORE text ever loads: raw crawl URL lists dedup on
  * the canonical URL (scheme/host case, default ports, dot-segments,
  * tracking parameters, fragments all collapse) and aggregate on the
  * registrable domain (per-domain caps, domain quality priors). The
  * reference has no URL surface at all; this is the index-side
  * boundary a 100 TB corpus build starts from (e.g. a CC-index sweep
  * dedups canonical URLs before fetching a single WARC byte).
  *
  * Canonicalization rules (RFC 3986 normalization + the standard
  * crawl-dedup extensions):
  *   1. scheme and host lowercase;
  *   2. default ports dropped (http:80, https:443), others kept;
  *   3. path dot-segments resolved (§5.2.4), empty path → "/";
  *   4. tracking query parameters dropped (utm_* prefix, gclid,
  *      fbclid, msclkid, mc_eid), survivors SORTED for
  *      order-insensitive equality, "?" dropped when none survive;
  *   5. fragment dropped.
  * Strict: no "://", an empty host, or a non-numeric port is None —
  * never a junk canonical.
  *
  * `registrableDomain` is the eTLD+1 heuristic: last two labels,
  * extended to three under an EMBEDDED set of common multi-label
  * public suffixes (co.uk, com.au, co.jp, …). The full Public Suffix
  * List is external data (zero-egress container); the heuristic is
  * documented as such and covers the dominant crawl mass — a real
  * deployment swaps in the PSL snapshot as a broadcast table without
  * touching callers.
  */
object Urls {

  final case class UrlParts(canonical: String, host: String,
                            registrable: String, nParams: Int,
                            path: String)

  private val TrackingExact =
    Set("gclid", "fbclid", "msclkid", "mc_eid")

  private val MultiSuffix = Set(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "co.kr", "co.za", "co.nz", "co.id", "co.th")

  /** eTLD+1 under the embedded multi-label suffix set; the whole host
    * when it has too few labels. */
  def registrableDomain(host: String): String = {
    val labels = host.split('.')
    if (labels.length <= 2) host
    else {
      val lastTwo = labels.takeRight(2).mkString(".")
      val keep = if (MultiSuffix.contains(lastTwo)) 3 else 2
      labels.takeRight(math.min(keep, labels.length)).mkString(".")
    }
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path, plus
    * the crawl-dedup extension of collapsing duplicate slashes
    * ("/a//b" → "/a/b"). A "." / ".." / trailing-empty final segment
    * leaves the path directory-shaped (trailing "/"), as the RFC
    * algorithm does. */
  private def resolveDots(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var endsDir = false
    path.split("/", -1).foreach {
      case "" | "." => endsDir = true
      case ".." =>
        if (out.nonEmpty) out.remove(out.length - 1)
        endsDir = true
      case seg => out += seg; endsDir = false
    }
    if (out.isEmpty) "/"
    else "/" + out.mkString("/") + (if (endsDir) "/" else "")
  }

  private def isTracking(param: String): Boolean = {
    val name = param.indexOf('=') match {
      case -1 => param
      case i => param.substring(0, i)
    }
    val n = name.toLowerCase
    n.startsWith("utm_") || TrackingExact.contains(n)
  }

  /** Parse + canonicalize; None on malformation. */
  def canonicalParts(url: String): Option[UrlParts] = {
    val sep = url.indexOf("://")
    if (sep <= 0) return None
    val scheme = url.substring(0, sep).toLowerCase
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' ||
      c == '.') || !scheme.head.isLetter) return None
    val rest = url.substring(sep + 3)
    val authorityEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (authority, tail) =
      if (authorityEnd < 0) (rest, "")
      else (rest.substring(0, authorityEnd), rest.substring(authorityEnd))
    if (authority.isEmpty) return None
    val (hostRaw, portOpt) = authority.lastIndexOf(':') match {
      case -1 => (authority, None)
      case i =>
        val p = authority.substring(i + 1)
        if (p.isEmpty || !p.forall(_.isDigit)) return None
        (authority.substring(0, i), Some(p.toInt))
    }
    if (hostRaw.isEmpty) return None
    val host = hostRaw.toLowerCase
    val port = portOpt.filterNot(p =>
      (scheme == "http" && p == 80) || (scheme == "https" && p == 443))
    // split tail into path / query / fragment
    val hashIdx = tail.indexOf('#')
    val noFrag = if (hashIdx < 0) tail else tail.substring(0, hashIdx)
    val qIdx = noFrag.indexOf('?')
    val (pathRaw, queryRaw) =
      if (qIdx < 0) (noFrag, "")
      else (noFrag.substring(0, qIdx), noFrag.substring(qIdx + 1))
    val path = if (pathRaw.isEmpty) "/" else resolveDots(pathRaw)
    val params = queryRaw.split("&").filter(_.nonEmpty)
      .filterNot(isTracking).sorted
    val canonical = new StringBuilder(scheme).append("://").append(host)
    port.foreach(p => canonical.append(':').append(p))
    canonical.append(path)
    if (params.nonEmpty) canonical.append('?').append(params.mkString("&"))
    Some(UrlParts(canonical.toString, host, registrableDomain(host),
      params.length, path))
  }

  def canonicalize(url: String): Option[String] =
    canonicalParts(url).map(_.canonical)

  /** RFC 3986 §5.2 reference resolution against an absolute base,
    * CANONICALIZED — the step that turns a page's href values into
    * crawl-graph edges. Handles absolute references (own scheme),
    * network-path (`//host/x` inherits the base scheme), absolute-path
    * (`/x`), relative-path (`x/y`, merged against the base directory),
    * and query-only (`?q`) forms. Fragment-only references are
    * same-document (None), and resolved URLs outside http/https
    * (mailto:, javascript:, …) are not fetchable edges (None). */
  def resolve(base: String, ref: String): Option[String] = {
    if (ref.startsWith("#")) return None
    val bp = canonicalParts(base).getOrElse(return None)
    val sep = base.indexOf("://")
    val scheme = base.substring(0, sep).toLowerCase
    val hostPort = bp.canonical.substring(scheme.length + 3)
      .takeWhile(c => c != '/' && c != '?')
    val colon = ref.indexOf(':')
    val hasScheme = colon > 0 && ref.take(colon).forall(c =>
      c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
      ref.head.isLetter
    val abs =
      if (hasScheme) ref
      else if (ref.startsWith("//")) scheme + ":" + ref
      else if (ref.startsWith("/")) s"$scheme://$hostPort$ref"
      else if (ref.startsWith("?")) s"$scheme://$hostPort${bp.path}$ref"
      else { // relative path: merge against the base directory
        val dir = bp.path.substring(0, bp.path.lastIndexOf('/') + 1)
        s"$scheme://$hostPort$dir$ref"
      }
    canonicalParts(abs) match {
      case Some(p) if abs.startsWith("http://") ||
        abs.startsWith("https://") => Some(p.canonical)
      case _ => None // non-fetchable scheme or malformed resolution
    }
  }

  /** (base, ref) → canonical absolute URL or null. */
  def resolveCol(base: Column, ref: Column): Column =
    udf { (b: String, r: String) =>
      for (bb <- Option(b); rr <- Option(r); out <- resolve(bb, rr)) yield out
    }.apply(base, ref)

  /** url string → struct(canonical, host, registrable, n_params,
    * path); null on malformed input. */
  def partsCol(c: Column): Column =
    udf { s: String =>
      Option(s).flatMap(canonicalParts).map(p =>
        (p.canonical, p.host, p.registrable, p.nParams, p.path))
    }.apply(c)
}

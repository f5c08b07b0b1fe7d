package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Host/URL string kernels shared by the custom catalyst expressions and
  * plain-Scala callers (tests, the sequential crawl oracle).
  *
  * Every method is deterministic and allocation-light; the `…U` variants take
  * and return `UTF8String` so generated code avoids extra conversions at the
  * call site. A mirror class with static forwarders is emitted for `object`s,
  * so janino-generated code can call `graft.functions.HostStr.reverseHostU(x)`.
  */
object HostStr {

  /** Split a host into labels with java.util.regex.Pattern.split("\\.")
    * semantics: trailing empty strings are dropped, internal empties kept.
    * (`HostToDomainGraph.java:88,320-328` relies on exactly this; Spark's
    * built-in `split` keeps trailing empties — see SURVEY.md §2 B2.)
    */
  def splitLabels(host: String): Array[String] = {
    var end = host.length
    while (end > 0 && host.charAt(end - 1) == '.') end -= 1
    if (end == 0) return Array.empty
    var n = 1
    var i = 0
    while (i < end) { if (host.charAt(i) == '.') n += 1; i += 1 }
    val out = new Array[String](n)
    var start = 0
    var k = 0
    i = 0
    while (i < end) {
      if (host.charAt(i) == '.') { out(k) = host.substring(start, i); k += 1; start = i + 1 }
      i += 1
    }
    out(k) = host.substring(start, end)
    out
  }

  /** Reverse host name: `www.example.com` ⇄ `com.example.www`. Identical to
    * `HostToDomainGraph.reverseHost` (`HostToDomainGraph.java:320-328`),
    * including the trailing-dot behaviour of Java's `split`.
    */
  def reverseHost(host: String): String = {
    val labels = splitLabels(host)
    var i = 0
    var j = labels.length - 1
    while (i < j) { val t = labels(i); labels(i) = labels(j); labels(j) = t; i += 1; j -= 1 }
    labels.mkString(".")
  }

  /** Strip a leading `www.` iff at least two labels remain afterwards
    * (`www.com` is kept — `HostToDomainGraph.java:358-364`).
    */
  def stripWww(host: String): String =
    if (host.startsWith("www.") && host.indexOf('.', 4) != -1) host.substring(4) else host

  /** Host-name validity: ASCII letters/digits/hyphen/underscore labels, at
    * least one dot, ≤253 chars, no empty labels (B11 normalization/validation
    * predicate; the reference delegates this to cc-pyspark's
    * `--validate_host_names`).
    */
  def isValidHost(host: String): Boolean = {
    val len = host.length
    if (len < 3 || len > 253) return false
    var i = 0
    var dots = 0
    var lastDot = -1
    while (i < len) {
      val c = host.charAt(i)
      if (c == '.') {
        if (i == 0 || i == lastDot + 1 || i == len - 1) return false
        dots += 1
        lastDot = i
      } else if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-' || c == '_')) {
        return false
      }
      i += 1
    }
    dots >= 1
  }

  /** Lowercased host of an absolute http(s) URL, or null when unparseable or
    * the host fails validation.
    */
  def urlHost(url: String): String = {
    val p = parseUrl(url)
    if (p == null) null else p.host
  }

  final case class ParsedUrl(scheme: String, host: String, port: Int,
                             path: String, query: String) // port -1 = default

  /** Tolerant absolute-URL parser for http/https. Returns null on anything
    * unparseable. Deterministic, no java.net.URI (strict + locale-sensitive).
    */
  def parseUrl(url: String): ParsedUrl = {
    if (url == null) return null
    val s = url.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return null
    var i = schemeEnd + 3
    val len = s.length
    // authority ends at first '/', '?' or '#'
    var authEnd = i
    while (authEnd < len && s.charAt(authEnd) != '/' && s.charAt(authEnd) != '?' && s.charAt(authEnd) != '#') authEnd += 1
    var auth = s.substring(i, authEnd)
    // strip userinfo
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    var host = auth
    var port = -1
    val colon = auth.lastIndexOf(':')
    if (colon >= 0) {
      val portStr = auth.substring(colon + 1)
      if (portStr.nonEmpty && portStr.forall(c => c >= '0' && c <= '9')) {
        try port = portStr.toInt catch { case _: NumberFormatException => return null }
        host = auth.substring(0, colon)
      } else if (portStr.isEmpty) {
        host = auth.substring(0, colon)
      } else return null
    }
    host = PublicSuffixList.normalize(host)
    if (!isValidHost(host)) return null
    if ((scheme == "http" && port == 80) || (scheme == "https" && port == 443)) port = -1
    // path / query (fragment dropped)
    var path = "/"
    var query = ""
    if (authEnd < len && s.charAt(authEnd) == '/') {
      var pathEnd = authEnd
      while (pathEnd < len && s.charAt(pathEnd) != '?' && s.charAt(pathEnd) != '#') pathEnd += 1
      path = s.substring(authEnd, pathEnd)
      i = pathEnd
    } else i = authEnd
    if (i < len && s.charAt(i) == '?') {
      var qEnd = i + 1
      while (qEnd < len && s.charAt(qEnd) != '#') qEnd += 1
      query = s.substring(i + 1, qEnd)
    }
    ParsedUrl(scheme, host, port, path, query)
  }

  /** SURT (Sort-friendly URI Reordering Transform) canonical key of an
    * absolute URL — the canonical ordering the reference's pipeline relies on
    * for hosts (`host2domaingraph.sh:100-105` discusses SURT ordering).
    * Form: `com,example,www[:port])/path?a=1&b=2` — scheme dropped, host
    * lowercased + label-reversed comma-joined, default port dropped, query
    * params sorted, fragment dropped. Null when unparseable.
    */
  def surt(url: String): String = {
    val p = parseUrl(url)
    if (p == null) return null
    val sb = new java.lang.StringBuilder(url.length)
    val labels = splitLabels(p.host)
    var i = labels.length - 1
    while (i >= 0) { sb.append(labels(i)); if (i > 0) sb.append(','); i -= 1 }
    if (p.port != -1) { sb.append(':'); sb.append(p.port) }
    sb.append(')')
    sb.append(p.path)
    if (p.query.nonEmpty) {
      val params = p.query.split("&", -1).sorted
      sb.append('?')
      var k = 0
      while (k < params.length) { sb.append(params(k)); if (k < params.length - 1) sb.append('&'); k += 1 }
    }
    sb.toString
  }

  // ---- UTF8String adapters for codegen / eval paths ----

  def reverseHostU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(reverseHost(s.toString))

  def stripWwwU(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(stripWww(s.toString))

  def surtU(s: UTF8String): UTF8String = {
    if (s == null) return null
    val r = surt(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def urlHostU(s: UTF8String): UTF8String = {
    if (s == null) return null
    val r = urlHost(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def registeredDomainU(s: UTF8String, psl: PublicSuffixList, icannOnly: Boolean,
                        multiPartSuffixesAsDomains: Boolean): UTF8String = {
    if (s == null) return null
    val host = s.toString
    psl.registeredDomain(host, icannOnly) match {
      case Some(d) => UTF8String.fromString(d)
      case None =>
        // `HostToDomainGraph.java:367-372`: with the flag on, ANY host that
        // failed strict domain assignment becomes its own domain.
        if (multiPartSuffixesAsDomains) UTF8String.fromString(PublicSuffixList.normalize(host))
        else null
    }
  }
}

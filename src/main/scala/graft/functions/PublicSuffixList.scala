package graft.functions

/** Public-suffix-list lookup with the exact semantics the reference relies on
  * via crawler-commons' `EffectiveTldFinder` (see
  * `/root/reference/src/main/java/org/commoncrawl/webgraph/HostToDomainGraph.java:366`
  * and the golden tests in `TestHostToDomainGraph.java`).
  *
  * Semantics (public PSL algorithm, https://publicsuffix.org/list/):
  *  - a rule matches a host if the rule's labels are a suffix of the host's
  *    labels; `*.` wildcard rules match exactly one extra label; `!` exception
  *    rules override wildcards (the suffix is the rule minus its leftmost
  *    label);
  *  - the prevailing rule is the exception rule if any matches, otherwise the
  *    longest matching rule;
  *  - STRICT mode (always used by the reference): if NO rule matches, or the
  *    host equals the public suffix itself, there is no assigned domain
  *    (`null` → the host is dropped from the graph, id mapped to -1);
  *  - `icannOnly` restricts matching to the ICANN section (the reference
  *    passes `!privateDomains`, `HostToDomainGraph.java:366`).
  *
  * The assigned (registered) domain is the public suffix plus one more label.
  */
final class PublicSuffixList private[functions] (
    private val rules: Map[String, PublicSuffixList.Rule]) extends Serializable {

  /** Longest matching public suffix of `host`, or None when no rule matches
    * (strict semantics: no implicit `*` fallback rule).
    */
  def publicSuffix(host: String, icannOnly: Boolean): Option[String] = {
    val h = PublicSuffixList.normalize(host)
    if (h.isEmpty) return None
    val labels = HostStr.splitLabels(h)
    val n = labels.length
    var bestLabels = -1 // label count of longest non-exception match
    var i = 0
    while (i < n) {
      val cand = labels.slice(i, n).mkString(".") // candidate suffix labels[i..n)
      rules.get(cand) match {
        case Some(r) if !(icannOnly && r.priv) =>
          if (r.exception && n - i >= 2) {
            // exception rule: public suffix is the rule minus its leftmost label
            return Some(labels.slice(i + 1, n).mkString("."))
          }
          if (r.plain && (n - i) > bestLabels) bestLabels = n - i
          // "*.cand": matches cand plus exactly one extra label to the left
          if (r.wildcard && i > 0 && (n - i + 1) > bestLabels) bestLabels = n - i + 1
        case _ =>
      }
      i += 1
    }
    if (bestLabels < 0) None
    else Some(labels.slice(n - bestLabels, n).mkString("."))
  }

  /** Registered ("assigned") domain: public suffix + one label.
    * Strict mode (the reference always passes `strict=true`): None when no
    * suffix matches or the host IS a suffix (such hosts get id -1 / dropped).
    */
  def registeredDomain(host: String, icannOnly: Boolean): Option[String] = {
    val h = PublicSuffixList.normalize(host)
    if (h.isEmpty) return None
    publicSuffix(h, icannOnly) match {
      case None => None
      case Some(ps) =>
        if (ps.length >= h.length) None // host == suffix → strict drop
        else {
          val rest = h.substring(0, h.length - ps.length - 1) // strip ".ps"
          val lastDot = rest.lastIndexOf('.')
          val label = if (lastDot < 0) rest else rest.substring(lastDot + 1)
          if (label.isEmpty) None else Some(label + "." + ps)
        }
    }
  }

  /** Whether `host` itself is exactly a public suffix (exercised by the
    * `--multipart-suffixes-as-domains` path, `HostToDomainGraph.java:367-372`).
    */
  def isPublicSuffix(host: String, icannOnly: Boolean): Boolean =
    publicSuffix(host, icannOnly).contains(PublicSuffixList.normalize(host))
}

object PublicSuffixList {

  /** One PSL name can carry several rule shapes (`ck` via `*.ck` + `!www.ck`). */
  final case class Rule(plain: Boolean = false, wildcard: Boolean = false,
                        exception: Boolean = false, priv: Boolean = false)

  def normalize(host: String): String = {
    var h = host.trim.toLowerCase(java.util.Locale.ROOT)
    while (h.endsWith(".")) h = h.substring(0, h.length - 1)
    h
  }

  /** Parse PSL-format text: `//` comments, blank lines, the
    * `===BEGIN PRIVATE DOMAINS===` section marker, `*.` wildcards, `!`
    * exceptions.
    */
  def parse(text: String): PublicSuffixList = {
    var priv = false
    val m = scala.collection.mutable.HashMap.empty[String, Rule]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.contains("===BEGIN PRIVATE DOMAINS===")) priv = true
      else if (line.nonEmpty && !line.startsWith("//")) {
        val entry = line.split("\\s+")(0).toLowerCase(java.util.Locale.ROOT)
        def upd(name: String)(f: Rule => Rule): Unit =
          m.put(name, f(m.getOrElse(name, Rule(priv = priv))))
        if (entry.startsWith("!")) upd(entry.substring(1))(_.copy(exception = true))
        else if (entry.startsWith("*.")) upd(entry.substring(2))(_.copy(wildcard = true))
        else upd(entry)(_.copy(plain = true))
      }
    }
    new PublicSuffixList(m.toMap)
  }

  /** Embedded deterministic PSL snapshot (no egress in this environment, so
    * crawler-commons' bundled list is unavailable). Contains every suffix the
    * reference golden tests exercise (`TestHostToDomainGraph.java:48-198`,
    * FIXTURES.md §3) plus a realistic set of common ICANN suffixes so synth
    * data behaves like the real web. Swap via `PublicSuffixList.parse` when a
    * full list file is available.
    */
  lazy val default: PublicSuffixList = parse(
    """// ===BEGIN ICANN DOMAINS===
      |com
      |org
      |net
      |edu
      |gov
      |mil
      |int
      |info
      |name
      |biz
      |io
      |co
      |me
      |us
      |ca
      |de
      |fr
      |es
      |it
      |altoadige.it
      |nl
      |se
      |no
      |os.hordaland.no
      |os.hedmark.no
      |fi
      |dk
      |pl
      |ru
      |jp
      |co.jp
      |ne.jp
      |or.jp
      |go.jp
      |ac.jp
      |cn
      |com.cn
      |net.cn
      |org.cn
      |gov.cn
      |edu.cn
      |au
      |com.au
      |net.au
      |org.au
      |gov.au
      |edu.au
      |nz
      |co.nz
      |net.nz
      |org.nz
      |govt.nz
      |ac.nz
      |uk
      |co.uk
      |org.uk
      |net.uk
      |gov.uk
      |ac.uk
      |sch.uk
      |ac
      |com.ac
      |edu.ac
      |gov.ac
      |net.ac
      |mil.ac
      |org.ac
      |aero
      |freight.aero
      |asia
      |jobs
      |mobi
      |museum
      |tel
      |travel
      |br
      |com.br
      |net.br
      |org.br
      |gov.br
      |in
      |co.in
      |net.in
      |org.in
      |gov.in
      |*.ck
      |!www.ck
      |dev
      |app
      |xyz
      |// ===BEGIN PRIVATE DOMAINS===
      |forgot.his.name
      |forgot.her.name
      |github.io
      |blogspot.com
      |s3.amazonaws.com
      |""".stripMargin)
}

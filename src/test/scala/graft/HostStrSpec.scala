package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HostStr, PublicSuffixList}

class HostStrSpec extends AnyFunSuite {

  test("reverseHost matches the reference's Java split semantics") {
    // `HostToDomainGraph.java:320-328`
    assert(HostStr.reverseHost("www.example.com") == "com.example.www")
    assert(HostStr.reverseHost("com.example.www") == "www.example.com")
    assert(HostStr.reverseHost("example.com") == "com.example")
    assert(HostStr.reverseHost("localhost") == "localhost")
    // Java Pattern.split drops TRAILING empty strings, keeps internal ones
    assert(HostStr.reverseHost("example.com.") == "com.example")
    assert(HostStr.reverseHost("example.com..") == "com.example")
    assert(HostStr.reverseHost("a..b") == "b..a")
    assert(HostStr.reverseHost("com.example.www,") == "www,.example.com")
    assert(HostStr.reverseHost("") == "")
  }

  test("reverseHost is an involution on dot-normalized names") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val labels = 1 + rnd.nextInt(5)
      val h = Seq.fill(labels)(
        Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString
      ).mkString(".")
      assert(HostStr.reverseHost(HostStr.reverseHost(h)) == h)
    }
  }

  test("stripWww: strip iff >=2 labels remain (www.com kept)") {
    // `HostToDomainGraph.java:358-364`, `TestHostToDomainGraph.java:363-375`
    assert(HostStr.stripWww("www.example.com") == "example.com")
    assert(HostStr.stripWww("www.com") == "www.com")
    assert(HostStr.stripWww("example.com") == "example.com")
    assert(HostStr.stripWww("www.hiro.name") == "hiro.name")
  }

  test("registered domain: strict PSL assignment (reference golden semantics)") {
    val psl = PublicSuffixList.default
    def rd(h: String, icann: Boolean = true) = psl.registeredDomain(h, icann)
    assert(rd("www.example.com").contains("example.com"))
    assert(rd("example.com").contains("example.com"))
    assert(rd("com").isEmpty)           // host == suffix → strict null
    assert(rd("gov.ac").isEmpty)        // multi-part suffix-only host dropped
    assert(rd("mail.ascension.gov.ac").contains("ascension.gov.ac"))
    assert(rd("foo.unknown-tld").isEmpty) // no matching rule → strict null
    assert(rd("hordaland.no").contains("hordaland.no"))
    assert(rd("oygarden.hordaland.no").contains("hordaland.no"))
    assert(rd("bibliotek.os.hordaland.no").contains("bibliotek.os.hordaland.no"))
    assert(rd("os.hordaland.no").isEmpty)
    // ICANN vs PRIVATE sections (`TestHostToDomainGraph.java:151-178`)
    assert(rd("adam.forgot.his.name", icann = true).contains("his.name"))
    assert(rd("adam.forgot.his.name", icann = false).contains("adam.forgot.his.name"))
    assert(rd("prz.his.name", icann = false).contains("his.name"))
    // wildcard + exception rules
    assert(rd("foo.bar.ck").contains("foo.bar.ck"))
    assert(rd("www.ck").contains("www.ck")) // exception !www.ck → suffix ck
    assert(rd("x.www.ck").contains("www.ck"))
    // trailing-comma garbage label still assigns (simple golden fixture)
    assert(rd("www,.example.com").contains("example.com"))
  }

  test("url parsing + host validation") {
    assert(HostStr.urlHost("https://www.Example.COM/path") == "www.example.com")
    assert(HostStr.urlHost("http://user:pw@host.org:8080/p?q=1#f") == "host.org")
    assert(HostStr.urlHost("ftp://x.com/") == null)
    assert(HostStr.urlHost("https://bad host.com/") == null)
    assert(HostStr.urlHost("not a url") == null)
    assert(HostStr.urlHost("https://single-label/") == null)
  }

  test("surt canonical key") {
    assert(HostStr.surt("https://www.Example.COM:443/a/b?b=2&a=1#frag")
      == "com,example,www)/a/b?a=1&b=2")
    assert(HostStr.surt("http://example.com") == "com,example)/")
    assert(HostStr.surt("http://example.com:8080/x") == "com,example:8080)/x")
    assert(HostStr.surt("garbage") == null)
  }

  test("tld of reversed name") {
    // `Graph.java:379-385`
    assert(HostStr.reverseHost("www.example.com").startsWith("com."))
  }
}

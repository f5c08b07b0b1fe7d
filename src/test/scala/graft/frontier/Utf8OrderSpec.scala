package graft.frontier

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The range-mode pruning superset proof rests on one premise: the
  * driver-side interval endpoints ([[AdjacencyFetcher.utf8Lt]] min/max over
  * the batch keys) are ordered by the SAME comparison Spark evaluates
  * `key >= lo && key <= hi` with and parquet BINARY min/max stats use —
  * unsigned UTF-8 byte order. Pin utf8Lt against Spark's own
  * UTF8String.binaryCompare over a seeded sweep that crosses every regime
  * where orderings diverge (hand-rolled property loop: scalacheck is not in
  * the offline cache).
  */
class Utf8OrderSpec extends AnyFunSuite {

  private def sparkLt(a: String, b: String): Boolean =
    UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b)) < 0

  test("utf8Lt agrees with UTF8String.binaryCompare on seeded random strings") {
    val rnd = new scala.util.Random(20260817L)
    // alphabet spanning the divergence regimes: ASCII, Latin-1, CJK, a
    // high-BMP code point above the surrogate range, and supplementary
    // characters (UTF-16 encodes them as surrogate pairs that compare LOW
    // in Java's String order but HIGH in UTF-8 bytes)
    val pool: IndexedSeq[String] =
      ('a' to 'f').map(_.toString) ++ Seq("0", "/", ")", "~", "é",
        "中", "｡", new String(Character.toChars(0x10000)),
        new String(Character.toChars(0x1F600)))
    def mk(): String =
      (0 until rnd.nextInt(8)).map(_ => pool(rnd.nextInt(pool.size))).mkString
    var checked = 0
    for (_ <- 1 to 4000) {
      val (a, b) = (mk(), mk())
      assert(AdjacencyFetcher.utf8Lt(a, b) == sparkLt(a, b),
        s"utf8Lt diverges from Spark's binary order on (${a.codePoints().toArray.mkString(",")}) vs (${b.codePoints().toArray.mkString(",")})")
      checked += 1
    }
    assert(checked == 4000)
  }

  test("the known Java-String-order divergence is ordered the UTF-8 way") {
    // U+FF61 (EF BD A1) vs U+10000 (F0 90 80 80): Java compares UTF-16 code
    // units (FF61 > D800 -> greater), UTF-8 bytes say less — the exact case
    // the scaladoc forbids `.sorted` for
    val bmp = "｡"
    val supp = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(supp) > 0)            // Java order: bmp AFTER supp
    assert(AdjacencyFetcher.utf8Lt(bmp, supp)) // UTF-8 order: bmp BEFORE supp
    assert(sparkLt(bmp, supp))                 // ...which is Spark's order
    // prefix rule: a strict prefix sorts first in both
    assert(AdjacencyFetcher.utf8Lt("com,ex)", "com,ex)/a") &&
      sparkLt("com,ex)", "com,ex)/a"))
    // equality is not less-than
    assert(!AdjacencyFetcher.utf8Lt("same", "same"))
  }
}

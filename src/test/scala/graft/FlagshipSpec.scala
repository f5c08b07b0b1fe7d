package graft

import org.scalatest.funsuite.AnyFunSuite

/** The flagship end-to-end slice (`SparkEntry.entry`): shape plus the
  * reference-default sitemap link class (VERDICT r5 item 5) — the central
  * sitemap host every synthetic robots.txt names must surface in the top-10
  * domains by indegree, so a regression that drops the sitemap union (or
  * the robots parse feeding it) fails here, not only in the bench.
  */
class FlagshipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship returns top-10 domains and reflects robots.txt sitemap links") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 10)
    val domains = rows.map(_.getAs[String]("rev_name")).toSeq
    // the sitemap hub (sitemaps.example.com → registered domain example.com)
    // is pointed at by ~every corpus domain — top-10 must contain it
    assert(domains.contains("com.example"),
      s"sitemap hub missing from top-10: $domains")
    val hub = rows.find(_.getAs[String]("rev_name") == "com.example").get
    assert(hub.getAs[Long]("indegree") >= 50L)
    // and the hottest corpus domain is still there (the pre-sitemap slice)
    assert(domains.contains("com.site0"))
  }
}

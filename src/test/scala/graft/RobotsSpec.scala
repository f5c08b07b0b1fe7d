package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.Robots

class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(hostBodies: (String, String)*): Map[String, Seq[String]] =
    Robots.parse(hostBodies.toDF("rev_host", "body"), agent = "graftbot")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap

  test("exact agent group beats wildcard; its rules alone apply") {
    val m = parse(("com.a",
      "User-agent: *\nDisallow: /all\nUser-agent: graftbot\nDisallow: /bot"))
    assert(m("com.a") == Seq("/bot"))
  }

  test("duplicate wildcard groups merge; duplicates and empty Disallow drop") {
    val m = parse(("com.b",
      "User-agent: *\nDisallow: /x\nDisallow:\n\nUser-agent: *\nDisallow: /y\nDisallow: /x"))
    assert(m("com.b") == Seq("/x", "/y"))
  }

  test("rules before any group are ignored; unmatched hosts are absent") {
    val m = parse(
      ("com.c", "Disallow: /orphan\nUser-agent: *\nDisallow: /ok"),
      ("com.d", "User-agent: otherbot\nDisallow: /x"),
      ("com.e", "# comments only"))
    assert(m == Map("com.c" -> Seq("/ok")))
  }

  test("multi-agent group applies to each named agent; keys case-insensitive") {
    val m = parse(("com.f",
      "user-agent: GRAFTBOT\nUser-Agent: other\ndisallow: /shared # trailing comment"))
    assert(m("com.f") == Seq("/shared"))
  }

  test("parse output feeds the Frontier robots contract (rev_host, disallow_prefixes)") {
    val out = Robots.parse(Seq(("com.g", "User-agent: *\nDisallow: /p"))
      .toDF("rev_host", "body"))
    assert(out.schema.fieldNames.toSeq == Seq("rev_host", "disallow_prefixes"))
    assert(out.schema("disallow_prefixes").dataType.simpleString == "array<string>")
  }

  test("end-to-end: parsed robots.txt gates the frontier — disallowed paths never scheduled") {
    import graft.frontier.{CorpusFetcher, Frontier, UrlSeen}
    import graft.functions.gf
    import graft.sources.SynthDocs
    val nHosts = 30
    val docs = SynthDocs.docs(spark, 200L, nHosts, seed = 42).toDF()
    val priorities = Frontier.hostPriorities(docs).localCheckpoint()
    val budgets = SynthDocs.politeness(spark, nHosts)
      .select(gf.reverse_host(col("host")).as("rev_host"), col("tokens_per_round"))
    // every host serves the same body: pages under /page/1 are off-limits
    // for us (exact-agent group), /img/ only for everyone else
    val bodies = priorities.select(col("rev_host"),
      lit("User-agent: graftbot\nDisallow: /page/1\nUser-agent: *\nDisallow: /img/")
        .as("body"))
    val robots = Robots.parse(bodies, agent = "graftbot").localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_robots_e2e").toString
    val c = Frontier.Config(dir, defaultTokens = 2, saltBuckets = 4,
      seenCfg = UrlSeen.Config(buckets = 4, bitsPerBucket = 1 << 14, numHashes = 5))
    Frontier.init(spark, c, SynthDocs.seeds(spark, 8, nHosts), priorities, robots)
    Frontier.run(spark, c, new CorpusFetcher(docs), 2, budgets, robots, priorities)
    val urls = Frontier.fetchLog(spark, c).collect().map(_.getAs[String]("url"))
    assert(urls.nonEmpty)
    assert(!urls.exists(u => u.contains("/page/1")))
    // the wildcard group's /img/ rule must NOT apply to graftbot
    assert(robots.collect().forall(
      _.getSeq[String](1) == Seq("/page/1")))
  }
}

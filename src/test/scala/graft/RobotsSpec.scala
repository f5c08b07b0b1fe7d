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
}

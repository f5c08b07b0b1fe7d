package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing as a declarative plan (north_star "robots.txt cache"):
  * raw fetched bodies → the `(rev_host, disallow_prefixes)` rule table the
  * [[Frontier]] enforces at enqueue.
  *
  * Semantics (REP, the subset the reference's crawling discipline needs):
  * lines are `key: value` records; `#` starts a comment; a run of
  * consecutive `User-agent` lines opens a GROUP whose `Disallow` records
  * apply to all those agents; the group that applies to a crawler is the
  * most specific match — an exact (case-insensitive) agent-name group beats
  * `*`; all groups of the winning specificity are merged (crawlers merge
  * duplicate `User-agent: *` groups); an empty `Disallow:` value means
  * allow-all and contributes no prefix.
  *
  * Scale shape: one `posexplode` over bodies, then per-host window work —
  * robots bodies are KB-sized, so every window partition is tiny and the
  * whole parse is a single shuffle by `rev_host` (the same key the rule
  * table joins on downstream — co-partitioned with its consumer). No UDFs:
  * every step is built-in (codegen'd) string/window work, so the parse is
  * also replicable in the DuckDB oracle as an independent second
  * implementation (q_robots_parse).
  */
object Robots {

  /** Parse raw robots.txt bodies.
    *
    * @param bodies (rev_host string, body string) — one fetched robots.txt
    *               per host (the cache layer keys refetches on rev_host)
    * @param agent  crawler product token, e.g. "graftbot"
    * @return (rev_host, disallow_prefixes array<string> sorted) — hosts with
    *         no applicable rules are ABSENT (the Frontier's left join treats
    *         absent as allow-all)
    */
  def parse(bodies: DataFrame, agent: String = "graftbot"): DataFrame = {
    val lines = bodies
      .select(col("rev_host"),
        posexplode(split(col("body"), "\n")).as(Seq("ln", "raw")))
      .select(col("rev_host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
    def keyVal(key: String): Column =
      when(lower(col("line")).startsWith(key + ":"),
        trim(expr(s"substring(line, ${key.length + 2})")))
    val tagged = lines
      .withColumn("agent_val", keyVal("user-agent"))
      .withColumn("disallow_val", keyVal("disallow"))
    // a User-agent line directly after a non-User-agent line opens a group
    val byLine = Window.partitionBy("rev_host").orderBy("ln")
    val grouped = tagged
      .withColumn("opens",
        (col("agent_val").isNotNull &&
          lag(col("agent_val"), 1).over(byLine).isNull).cast("int"))
      .withColumn("grp", sum(col("opens")).over(byLine))
    // group specificity: 2 = names this agent exactly, 1 = wildcard
    val grpRank = grouped
      .groupBy("rev_host", "grp")
      .agg(
        max(when(lower(col("agent_val")) === agent.toLowerCase, 2)
          .when(col("agent_val") === "*", 1).otherwise(0)).as("rank"),
        collect_list(when(col("disallow_val") =!= "", col("disallow_val")))
          .as("prefixes"))
    val byHost = Window.partitionBy("rev_host")
    grpRank
      .withColumn("best", max(col("rank")).over(byHost))
      .filter(col("rank") === col("best") && col("best") > 0)
      .groupBy("rev_host")
      .agg(sort_array(array_distinct(flatten(collect_list(col("prefixes")))))
        .as("disallow_prefixes"))
      .filter(size(col("disallow_prefixes")) > 0)
  }
}

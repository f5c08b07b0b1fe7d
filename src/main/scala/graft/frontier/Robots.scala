package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gf

/** robots.txt parsing as a declarative plan (north_star "robots.txt cache"):
  * raw fetched bodies → the per-host rule table the [[Frontier]] enforces at
  * enqueue.
  *
  * Semantics (RFC 9309 + the two de-facto extensions the reference's crawl
  * discipline ingests):
  *  - lines are `key: value` records; `#` starts a comment; a run of
  *    consecutive `User-agent` lines opens a GROUP whose `Disallow`/`Allow`/
  *    `Crawl-delay` records apply to all those agents; the group that applies
  *    to a crawler is the most specific match — an exact (case-insensitive)
  *    agent-name group beats `*`; all groups of the winning specificity are
  *    merged (RFC 9309 §2.2.1: crawlers merge duplicate groups); an empty
  *    `Disallow:`/`Allow:` value contributes no rule.
  *  - rule PRECEDENCE is applied by [[Frontier]]'s filter: the longest
  *    matching prefix wins, `Allow` wins length ties (RFC 9309 §2.2.2).
  *  - `Crawl-delay` (non-standard, honored by most crawlers): seconds between
  *    fetches for the winning group; smallest numeric value wins when groups
  *    merge. [[crawlDelayBudgets]] turns it into politeness token budgets.
  *  - `Sitemap` (sitemaps.org cross-protocol record): NOT group-scoped —
  *    every `Sitemap:` line applies host-wide. The reference ingests these
  *    links into the host graph BY DEFAULT
  *    (`/root/reference/src/script/hostgraph/hostgraph_config.sh:19-21`
  *    `INCLUDE_ROBOTSTXT_SITEMAP_LINKS=true`;
  *    `build_hostgraph.sh:151-152` feeds `robotstxt.paths.gz` to the link
  *    extractor) — [[sitemapHostLinks]] and [[sitemapUrls]] reproduce that
  *    edge/candidate class.
  *
  * Scale shape: one `posexplode` over bodies, then per-host window work —
  * robots bodies are KB-sized, so every window partition is tiny and the
  * whole parse is a single shuffle by `rev_host` (the same key the rule
  * table joins on downstream — co-partitioned with its consumer). No UDFs:
  * every step is built-in (codegen'd) string/window work, so the parse is
  * also replicable in the DuckDB oracle as an independent second
  * implementation (q_robots_parse, q_sitemap_links).
  */
object Robots {

  /** Parse raw robots.txt bodies into the full per-host rule table.
    *
    * @param bodies (rev_host string, body string) — one fetched robots.txt
    *               per host (the cache layer keys refetches on rev_host)
    * @param agent  crawler product token, e.g. "graftbot"
    * @return (rev_host, disallow_prefixes array<string> sorted,
    *          allow_prefixes array<string> sorted, crawl_delay double|null,
    *          sitemaps array<string> sorted) — hosts with no applicable
    *          rules AND no sitemaps are ABSENT (the Frontier's left join
    *          treats absent as allow-all)
    */
  def parseFull(bodies: DataFrame, agent: String = "graftbot"): DataFrame = {
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
      .withColumn("allow_val", keyVal("allow"))
      .withColumn("delay_val", keyVal("crawl-delay").cast("double"))
      .withColumn("sitemap_val", keyVal("sitemap"))
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
          .as("dis"),
        collect_list(when(col("allow_val") =!= "", col("allow_val")))
          .as("alw"),
        min(col("delay_val")).as("delay"),
        // Sitemap records are host-wide: carried through every group (and the
        // pre-group grp=0 run) and re-merged per host below
        collect_list(when(col("sitemap_val") =!= "", col("sitemap_val")))
          .as("maps"))
    val byHost = Window.partitionBy("rev_host")
    grpRank
      .withColumn("best", max(col("rank")).over(byHost))
      .withColumn("all_maps",
        sort_array(array_distinct(flatten(collect_list(col("maps")).over(byHost)))))
      .withColumn("min_grp", min(col("grp")).over(byHost))
      .filter((col("rank") === col("best") && col("best") > 0) ||
        // hosts with sitemaps but no applicable group still get one row
        (col("grp") === col("min_grp") && col("best") === 0 &&
          size(col("all_maps")) > 0))
      .groupBy("rev_host")
      .agg(
        sort_array(array_distinct(flatten(
          collect_list(when(col("best") > 0, col("dis"))))))
          .as("disallow_prefixes"),
        sort_array(array_distinct(flatten(
          collect_list(when(col("best") > 0, col("alw"))))))
          .as("allow_prefixes"),
        min(when(col("best") > 0, col("delay"))).as("crawl_delay"),
        first(col("all_maps")).as("sitemaps"))
      .filter(size(col("disallow_prefixes")) > 0 ||
        size(col("allow_prefixes")) > 0 || col("crawl_delay").isNotNull ||
        size(col("sitemaps")) > 0)
  }

  /** The [[Frontier]] robots contract of rounds 1-3, unchanged:
    * (rev_host, disallow_prefixes), hosts with no disallow rules absent.
    * Kept as the minimal-rule projection of [[parseFull]].
    */
  def parse(bodies: DataFrame, agent: String = "graftbot"): DataFrame =
    parseFull(bodies, agent)
      .filter(size(col("disallow_prefixes")) > 0)
      .select(col("rev_host"), col("disallow_prefixes"))

  /** Politeness budgets derived from `Crawl-delay` (VERDICT r3 item 4): a
    * host demanding `d` seconds between fetches gets
    * `max(1, floor(roundSeconds / d))` fetch tokens per round. Join these
    * UNDER the explicit operator budget table (explicit overrides — see
    * `Frontier.budgetsWithRobots`).
    *
    * @param rules [[parseFull]] output (needs rev_host, crawl_delay)
    * @param roundSeconds wall-clock a frontier round models (fetch pacing
    *                     horizon); tokens are per round
    */
  def crawlDelayBudgets(rules: DataFrame, roundSeconds: Double = 60.0): DataFrame =
    rules
      .filter(col("crawl_delay").isNotNull && col("crawl_delay") > 0)
      .select(col("rev_host"),
        greatest(lit(1L), floor(lit(roundSeconds) / col("crawl_delay")))
          .cast("int").as("tokens_per_round"))

  /** The RFC 9309 rule DECISION as a column expression: is `path` fetchable
    * under `disallow`/`allow` pattern arrays? §2.2.2 precedence — the rule
    * with the most octets wins, `Allow` wins length ties; §2.2.3 special
    * characters — `*` matches any octet sequence, trailing `$` anchors the
    * path end; rules without them take a literal-prefix fast path (no
    * per-row regex). A null `allow` array means no Allow rules.
    * Shared by the Frontier's enqueue filter and the q_rep_match oracle row.
    */
  def allowed(path: Column, disallow: Column, allow: Column): Column = {
    val dis = when(disallow.isNotNull,
      array_max(transform(disallow, p => matchLen(path, p))))
    val alw = when(allow.isNotNull,
      array_max(transform(allow, p => matchLen(path, p))))
    dis.isNull || (alw.isNotNull && alw >= dis)
  }

  /** Octet length of `rule` if it matches `path`, else null (§2.2.2
    * specificity).
    */
  private def matchLen(path: Column, rule: Column): Column = {
    val special = rule.contains("*") || rule.endsWith("$")
    when(special, when(regexp_like(path, patternRegex(rule)), length(rule)))
      .otherwise(when(path.startsWith(rule), length(rule)))
  }

  /** A rule pattern → an anchored Java regex: escape regex metacharacters,
    * then `*` → `.*`; a trailing `$` (stripped before escaping) re-anchors.
    */
  private def patternRegex(p: Column): Column = {
    val anchored = p.endsWith("$")
    val body = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = regexp_replace(body,
      "[\\\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|]", "\\\\$0")
    concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Sitemap URLs as frontier seed candidates: (url). Union into the seed
    * list at [[Frontier.init]] (or enqueue on robots refetch) — the
    * candidate class the reference captures by default.
    */
  def sitemapUrls(rules: DataFrame): DataFrame =
    rules.select(explode(col("sitemaps")).as("url")).distinct()

  /** Sitemap directives as host-graph link tuples `<from_host, to_host>`
    * (REVERSED names, the [[graft.operators.HostGraph.hostLinks]] schema):
    * an edge from the robots.txt host to each sitemap URL's host. Union with
    * `hostLinks(docs)` before `HostGraph.build` to reproduce the reference's
    * `INCLUDE_ROBOTSTXT_SITEMAP_LINKS=true` default.
    */
  def sitemapHostLinks(rules: DataFrame): DataFrame =
    rules
      .select(col("rev_host").as("from_host"),
        explode(col("sitemaps")).as("sitemap_url"))
      .select(col("from_host"),
        gf.reverse_host(gf.url_host(col("sitemap_url"))).as("to_host"))
      .filter(col("to_host").isNotNull)
      .distinct()
}

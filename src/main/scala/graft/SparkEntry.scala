package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators.{DenseIds, DomainGraph, HostGraph}
import graft.sources.SynthDocs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` runs the flagship end-to-end slice; `queries` is one entry per
  * implemented operator from SURVEY.md §2, each runnable on a testdata dir
  * and (where SQL-expressible) checked against DuckDB via `oracleSql`.
  */
object SparkEntry {

  /** Flagship: docs → outlink extraction → host graph → domain fold →
    * top-10 domains by indegree (SURVEY.md §7.5 — the minimum end-to-end
    * slice through scan, explode, custom expressions, groupBy, dense-id
    * assignment, joins, sort, limit).
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = SynthDocs.docs(spark, 2000, 100).toDF()
    val links = HostGraph.hostLinks(docs)
    val (hostV, hostE) = HostGraph.build(links)
    val dom = DomainGraph.fold(hostV, hostE)
    val indeg = dom.edges.groupBy("to_id").agg(count(lit(1)).as("indegree"))
    dom.vertices
      .join(indeg, dom.vertices("id") === indeg("to_id"))
      .select(col("rev_name"), col("num_hosts"), col("indegree"))
      .orderBy(desc("indegree"), asc("rev_name"))
      .limit(10)
  }

  // ---- operator queries over the driver testdata (oracle-checked) ----
  // Column names are aligned 1:1 with oracleSql; double aggregates rounded
  // identically on both sides so value hashes match.

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1-style hash aggregation with partial agg (TPC-H Q1 shape)
    "q_agg" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
             round(sum("l_extendedprice"), 2).as("sum_price"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // D4: string frequency count, (count desc, key asc) — GraphExplorer.java:305-313
    "q_freq" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("event_type"))
    }),
    // B2: reverse_host custom expression over a derived host column
    "q_reverse_host" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(gf.reverse_host(concat(col("source"), lit(".example.com"))).as("rev_host"))
        .groupBy("rev_host").agg(count(lit(1)).as("cnt"))
        .orderBy("rev_host")
    }),
    // B3: strip_www (www.com edge case preserved)
    "q_strip_www" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(gf.strip_www(
          when(col("doc_id") % 2 === 0, concat(lit("www."), col("source"), lit(".org")))
            .otherwise(lit("www.com"))).as("host"))
        .groupBy("host").agg(count(lit(1)).as("cnt"))
        .orderBy("host")
    }),
    // B11/A7: url_host validation + extraction over derived URLs
    "q_url_host" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(gf.url_host(
          concat(lit("https://www."), col("source"), lit(".com:443/p/"), col("doc_id"))).as("host"))
        .groupBy("host").agg(count(lit(1)).as("cnt"))
        .orderBy("host")
    }),
    // E6: top-k by measure with filter pushdown (TakeOrderedAndProject)
    "q_topk" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
        .orderBy(desc("price"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(100)
    }),
    // D3/E1: dense id assignment in sort order (scalable two-pass) over
    // distinct derived names — ids must equal DuckDB row_number()-1
    "q_dense_ids" -> ((s, dir) => {
      val names = s.read.parquet(t(dir, "customer"))
        .select(lower(col("c_name")).as("name")).distinct()
      DenseIds.assign(names, "name").select(col("id"), col("name")).orderBy("id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_freq" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY cnt DESC, event_type ASC",
    "q_reverse_host" ->
      """SELECT array_to_string(list_reverse(string_split(source || '.example.com', '.')), '.') AS rev_host,
        |  count(*) AS cnt
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_strip_www" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN source || '.org' ELSE 'www.com' END AS host,
        |  count(*) AS cnt
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_url_host" ->
      """SELECT 'www.' || source || '.com' AS host, count(*) AS cnt
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY price DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin,
    "q_dense_ids" ->
      """SELECT row_number() OVER (ORDER BY name) - 1 AS id, name
        |FROM (SELECT DISTINCT lower(c_name) AS name FROM customer)
        |ORDER BY id""".stripMargin
  )
}

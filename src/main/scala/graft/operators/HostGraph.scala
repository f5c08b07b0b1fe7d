package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Host-level webgraph construction from the interleaved-docs table —
  * the Spark-native replacement for the cc-pyspark extraction + graph-build
  * jobs the reference orchestrates (`build_hostgraph.sh:36-76`,
  * `hostgraph_config.sh:8-13` "saved as tuples <from_host, to_host>").
  *
  * Contract of the produced tables (reference invariants A+B,
  * `HostToDomainGraph.java:30-46`):
  *  - vertices(id: long, rev_name: string): reversed names, lexicographically
  *    sorted, ids dense 0..n-1 in sort order;
  *  - edges(from_id: long, to_id: long): deduplicated, no self loops,
  *    sorted by (from_id, to_id).
  */
object HostGraph {

  /** Extract host-level link tuples `<from_host, to_host>` (REVERSED names)
    * from the docs table: explode spans, pull absolute URLs out of text spans
    * (A7), take `media_ref` of media spans, canonicalize + validate hosts.
    *
    * Narrow pipeline (explode + regexp + custom expressions, all codegen'd,
    * zero shuffles) followed by one distinct.
    */
  def hostLinks(docs: DataFrame, dedup: Boolean = true): DataFrame = {
    val spans = docs.select(col("doc_id"), explode(col("spans")).as("span"))
    val targets = spans.select(
      col("doc_id"),
      explode(
        when(col("span.kind") === "text", gf.extract_urls(col("span.text")))
          .otherwise(array(col("span.media_ref")))).as("url"))
    val links = targets
      .select(
        gf.reverse_host(gf.url_host(col("doc_id"))).as("from_host"),
        gf.reverse_host(gf.url_host(col("url"))).as("to_host"))
      .filter(col("from_host").isNotNull && col("to_host").isNotNull)
    // dedup=false for append-mode streaming sinks (stateless plan); the
    // graph build dedups at fold time anyway
    if (dedup) links.distinct() else links
  }

  /** Build the numeric host graph from link tuples.
    *
    * The two joins remapping names → ids are string-keyed sort-merge joins
    * (the same shape as the reference's Spark job); the vertices side is
    * re-used for both ends.
    */
  /** Multi-crawl merge (H3, `build_hostgraph.sh:183-215`): union of per-crawl
    * link sets, deduplicated at graph-build time.
    */
  def mergeLinks(crawls: Seq[DataFrame]): DataFrame =
    crawls.reduce(_ unionByName _).distinct()

  /** Graph build with STABLE vertex-id reuse across crawls (the reference's
    * `--vertex_ids` mode, `build_hostgraph.sh:287-290,376`): names already in
    * the persisted vertices table keep their ids; only new names get fresh
    * ids, assigned densely in sort order starting after the existing maximum.
    * (Id reuse necessarily relaxes invariant B's ids-equal-sort-rank property
    * for the merged table — exactly as in the reference's merged graphs.)
    */
  def buildWithExistingIds(links: DataFrame,
                           existingVertices: DataFrame): (DataFrame, DataFrame) = {
    val names = links.select(col("from_host").as("rev_name"))
      .union(links.select(col("to_host").as("rev_name")))
      .distinct()
    val maxId = existingVertices.agg(max("id")).first() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    val newNames = names.join(existingVertices, Seq("rev_name"), "left_anti")
    val newVerts = DenseIds.assign(newNames, "rev_name")
      .select((col("id") + maxId + 1).as("id"), col("rev_name"))
    val vertices = existingVertices.select("id", "rev_name").unionByName(newVerts)
      .localCheckpoint(false) // lazy: materialized by the consumer's action
    val edges = links
      .join(vertices.select(col("rev_name").as("from_host"), col("id").as("from_id")), Seq("from_host"))
      .join(vertices.select(col("rev_name").as("to_host"), col("id").as("to_id")), Seq("to_host"))
      .select(col("from_id"), col("to_id"))
      .filter(col("from_id") =!= col("to_id"))
      .distinct()
    (vertices, edges)
  }

  /** Transpose (F1, `process_webgraph.sh:241-251`): reverse all arcs. */
  def transpose(edges: DataFrame): DataFrame =
    edges.select(col("to_id").as("from_id"), col("from_id").as("to_id"))

  def build(links: DataFrame): (DataFrame, DataFrame) = {
    val names = links.select(col("from_host").as("rev_name"))
      .union(links.select(col("to_host").as("rev_name")))
      .distinct()
    val vertices = DenseIds.assign(names, "rev_name")
      .select(col("id"), col("rev_name"))
    val edges = links
      .join(vertices.withColumnRenamed("rev_name", "from_host")
                    .withColumnRenamed("id", "from_id"), Seq("from_host"))
      .join(vertices.withColumnRenamed("rev_name", "to_host")
                    .withColumnRenamed("id", "to_id"), Seq("to_host"))
      .select(col("from_id"), col("to_id"))
      .filter(col("from_id") =!= col("to_id"))
      .distinct()
    (vertices, edges)
  }
}

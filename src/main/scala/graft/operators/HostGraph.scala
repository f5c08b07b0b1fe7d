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

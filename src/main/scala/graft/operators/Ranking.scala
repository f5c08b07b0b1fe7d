package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degrees, rank assignment and the rank join — the Spark re-expression of
  * `JoinSortRanks` (`JoinSortRanks.java`) and the degree reports
  * (`process_webgraph.sh:163-176,312-328`).
  */
object Ranking {

  /** Out-degrees: (id, outdeg). Nodes with no out-arcs are absent (the
    * reference's degree files list every node; join back onto vertices with
    * coalesce(0) when needed — see [[withDegrees]]).
    */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("from_id").as("id")).agg(count(lit(1)).as("outdeg"))

  def inDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("to_id").as("id")).agg(count(lit(1)).as("indeg"))

  /** Vertices + (outdeg, indeg), zero-filled — `Stats --save-degrees`
    * equivalent (`process_webgraph.sh:312-313`).
    */
  def withDegrees(vertices: DataFrame, edges: DataFrame): DataFrame =
    vertices
      .join(outDegrees(edges), Seq("id"), "left_outer")
      .join(inDegrees(edges), Seq("id"), "left_outer")
      .na.fill(0L, Seq("outdeg", "indeg"))

  /** Degree distribution: (degree, n_nodes), zero degrees skipped
    * (`process_webgraph.sh:191-198`).
    */
  def degreeDistribution(degrees: DataFrame, degCol: String): DataFrame =
    degrees.filter(col(degCol) > 0)
      .groupBy(col(degCol).as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")

  /** Top-k report: degree > threshold, sorted desc, first k
    * (`process_webgraph.sh:163-176`: threshold 1000, k 10000) — planned as
    * TakeOrderedAndProject, no global sort materialized.
    */
  def topDegrees(degrees: DataFrame, degCol: String,
                 threshold: Long = 1000, k: Int = 10000): DataFrame =
    degrees.filter(col(degCol) > threshold)
      .orderBy(desc(degCol), asc("id"))
      .limit(k)

  /** Rank assignment + join, reproducing `JoinSortRanks`
    * (`JoinSortRanks.java:57-161`): rank = row position under
    * (value DESC, id ASC) — row_number, NOT rank(); ties broken by id.
    *
    * @param vertices (id, rev_name[, extra…])
    * @param scores   (id, hc_val: float, pr_val: double)
    * @return (hc_rank, hc_val, pr_rank, pr_val, rev_name[, extra…]) ordered
    *         by hc_rank (`process_webgraph.sh:141-143` re-sort)
    */
  def joinRanks(vertices: DataFrame, scores: DataFrame): DataFrame = {
    val hcRanked = Ranks.rowNumber(
      scores.select(col("id"), col("hc_val"), col("pr_val")),
      Seq(col("hc_val").desc, col("id").asc), "hc_rank")
    val ranked = Ranks.rowNumber(
      hcRanked, Seq(col("pr_val").desc, col("id").asc), "pr_rank")
    val extra = vertices.columns.filter(c => c != "id" && c != "rev_name")
    val cols = Seq("hc_rank", "hc_val", "pr_rank", "pr_val", "rev_name") ++ extra
    ranked.join(vertices, Seq("id"))
      .select(cols.map(col): _*)
      .orderBy("hc_rank")
  }
}

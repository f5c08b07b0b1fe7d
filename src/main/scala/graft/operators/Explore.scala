package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** The exploration query surface of `Graph`/`GraphExplorer`
  * (`Graph.java`, `GraphExplorer.java`) over the vertices/edges tables.
  *
  * The reference explores a memory-mapped BVGraph with per-vertex iterators;
  * here the adjacency IS the (bucketable, partition-prunable) edges table and
  * every query is a declarative plan. Label↔ID maps (`Graph.java:102-126`)
  * are joins against the vertices table — the table is the bidirectional map.
  */
object Explore {

  /** Compressed-adjacency equivalent (A8): (id, successors sorted). Persist
    * bucketed by id for repeated point queries.
    */
  def adjacency(edges: DataFrame): DataFrame =
    edges.groupBy(col("from_id").as("id"))
      .agg(sort_array(collect_list(col("to_id"))).as("successors"))

  /** Successors of a vertex by id (`Graph.java:160-166`). */
  def successors(edges: DataFrame, id: Long): DataFrame =
    edges.filter(col("from_id") === id).select(col("to_id").as("id")).orderBy("id")

  /** Predecessors = successors on the transpose (F1). */
  def predecessors(edges: DataFrame, id: Long): DataFrame =
    edges.filter(col("to_id") === id).select(col("from_id").as("id")).orderBy("id")

  /** Label→ID / ID→label lookup joins (C9, `Graph.java:102-126`). */
  def idOfLabel(vertices: DataFrame, revName: String): DataFrame =
    vertices.filter(col("rev_name") === revName).select("id")

  def labelOfId(vertices: DataFrame, id: Long): DataFrame =
    vertices.filter(col("id") === id).select("rev_name")

  /** Set-valued C9 lookups: the vertices table IS the bidirectional map, so
    * batch translation in either direction is a join against it (broadcast
    * when the lookup set is small).
    */
  def idsOfLabels(vertices: DataFrame, labels: DataFrame): DataFrame =
    labels.select("rev_name").join(vertices, Seq("rev_name")).select("id")

  def labelsOfIds(vertices: DataFrame, ids: DataFrame): DataFrame =
    ids.select("id").join(vertices, Seq("id")).select("id", "rev_name")

  /** Vertices under a reversed-name prefix (B9, iepm prefix intervals
    * `Graph.java:176-202`). Sorted-ID invariant makes the result a contiguous
    * id range; the predicate pushes to the parquet scan via min/max stats.
    */
  def prefixVertices(vertices: DataFrame, prefix: String): DataFrame =
    vertices.filter(col("rev_name").startsWith(prefix)).orderBy("id")

  /** Successor/predecessor ∩ vertex set (C8, `Graph.java:204-206,314-316`). */
  def successorIntersect(edges: DataFrame, id: Long, set: DataFrame): DataFrame =
    intersect(successors(edges, id), set)

  def predecessorIntersect(edges: DataFrame, id: Long, set: DataFrame): DataFrame =
    intersect(predecessors(edges, id), set)

  /** Sorted-list intersection/difference (C6/C7, `Graph.java:388-445`). */
  def intersect(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("id"), "left_semi").orderBy("id")

  def difference(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("id"), "left_anti").orderBy("id")

  /** Shared successors of n source vertices seen by between minShared and
    * maxShared of them (D7, `Graph.java:322-377`: k=n intersection, k=1
    * union, exact-k). The reference's k-way counting merge
    * (`CountingMergedIntIterator.java`) is this groupBy.
    */
  def sharedSuccessors(edges: DataFrame, sources: Seq[Long],
                       minShared: Int, maxShared: Int): DataFrame =
    edges.filter(col("from_id").isin(sources: _*))
      .select(col("from_id"), col("to_id"))
      .distinct()
      .groupBy(col("to_id").as("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared && col("n_shared") <= maxShared)
      .orderBy("id")

  /** Counting merge of the successor multisets of `sources` — multiplicity
    * per value, ordered (D6, `CountingMergedIntIterator.java:23-135`).
    * Input edges may carry duplicates here (the reference merges arbitrary
    * sorted int streams); pass a pre-deduped edge set for graph semantics.
    */
  def countingMerge(lists: DataFrame): DataFrame =
    lists.groupBy(col("value")).agg(count(lit(1)).as("multiplicity")).orderBy("value")

  /** TLD frequency of the successors of a vertex (D5, `Graph.java:212-288`):
    * count successors per top-level domain of their reversed name.
    */
  def successorTldCounts(edges: DataFrame, vertices: DataFrame, id: Long): DataFrame =
    successors(edges, id)
      .join(vertices, "id")
      .groupBy(gf.tld(col("rev_name")).as("tld"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tld"))

  /** String frequency report (D4, `GraphExplorer.java:305-313`):
    * (count desc, value asc).
    */
  def frequencies(df: DataFrame, c: Column): DataFrame =
    df.groupBy(c.as("value")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))

  /** Subgraph metrics for a vertex set (D11, `Graph.java:502-531`): nodes,
    * in-cluster arcs, arcs leaving/entering the cluster, distinct outer
    * nodes linked/linking, average in-cluster degree.
    */
  def subgraphMetrics(edges: DataFrame, members: DataFrame): DataFrame = {
    val m = members.select(col("id")).distinct()
    val tagged = edges
      .join(m.select(col("id").as("from_id"), lit(1).as("from_in")), Seq("from_id"), "left_outer")
      .join(m.select(col("id").as("to_id"), lit(1).as("to_in")), Seq("to_id"), "left_outer")
      .select(col("from_id"), col("to_id"),
        coalesce(col("from_in"), lit(0)).as("from_in"),
        coalesce(col("to_in"), lit(0)).as("to_in"))
    val nNodes = m.count()
    tagged.agg(
      lit(nNodes).as("n_nodes"),
      sum(when(col("from_in") === 1 && col("to_in") === 1, 1).otherwise(0)).as("arcs_inside"),
      sum(when(col("from_in") === 1 && col("to_in") === 0, 1).otherwise(0)).as("arcs_out"),
      sum(when(col("from_in") === 0 && col("to_in") === 1, 1).otherwise(0)).as("arcs_in"),
      countDistinct(when(col("from_in") === 1 && col("to_in") === 0, col("to_id"))).as("outer_linked"),
      countDistinct(when(col("from_in") === 0 && col("to_in") === 1, col("from_id"))).as("outer_linking")
    ).withColumn("avg_degree",
      round(col("arcs_inside") / greatest(lit(nNodes).cast("double"), lit(1.0)), 6))
  }
}

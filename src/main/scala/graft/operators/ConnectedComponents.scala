package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weak/strong connected components as iterative DataFrame label propagation —
  * the capability the reference delegates to WebGraph's
  * `ConnectedComponents -m --renumber --sizes -t` /
  * `StronglyConnectedComponents` (`process_webgraph.sh:267-272`).
  */
object ConnectedComponents {

  /** Weakly connected components: min-label propagation over the
    * symmetrized edge set until fixpoint. Returns (id, component) where
    * component = smallest node id in the component.
    *
    * Each iteration is one shuffle (groupBy id); AQE handles skewed hubs.
    * For 10^8+ nodes the iteration count is the graph diameter of the
    * symmetrized graph — typically <20 for web graphs; large-star/small-star
    * would cut that further but min-propagation matches the reference's
    * output contract and stays simple.
    */
  def weak(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("from_id"), col("to_id"))
      .union(edges.select(col("to_id").as("from_id"), col("from_id").as("to_id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()

    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint() // truncate lineage per iteration (plan growth → OOM)

    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val neighborMin = sym
        .join(labels, sym("from_id") === labels("id"))
        .groupBy(col("to_id").as("id"))
        .agg(min("component").as("nbr_min"))
      val newLabels = labels
        .join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
        .localCheckpoint()
      changed = newLabels
        .join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).count()
      labels = newLabels
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Component sizes, renumbered by decreasing size (WebGraph `--renumber
    * --sizes` contract): (component_rank, size) with rank 0 = largest.
    */
  def sizes(components: DataFrame): DataFrame = {
    val s = components.groupBy("component").agg(count(lit(1)).as("size"))
    Ranks.rowNumber(s, Seq(col("size").desc, col("component").asc), "component_rank")
      .select((col("component_rank") - 1).as("component_rank"), col("size"))
      .orderBy("component_rank")
  }

  /** Size distribution report (`process_webgraph.sh:179-189`):
    * (size, n_components, percent_of_nodes).
    */
  def sizeDistribution(components: DataFrame): DataFrame = {
    val total = components.count()
    components.groupBy("component").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_components"))
      .withColumn("percent",
        round(col("size") * col("n_components") * lit(100.0) / lit(total), 4))
      .orderBy(desc("size"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Strongly connected components (F5 — the reference delegates to WebGraph's
  * `StronglyConnectedComponents --renumber --sizes`,
  * `process_webgraph.sh:270-272`, consuming only the size distribution).
  *
  * Implementation: mutual-reachability closure — scc(v) = min{u : u ⇄ v} —
  * computed from the forward BFS closure and its transpose. Pair-state is
  * O(n·reachable): validation/report scale (the reference runs SCC on one
  * big-memory node too). The distributed scale path is forward-backward
  * coloring, which plugs into the same output contract.
  */
object Scc {

  /** (id, component) with component = smallest id in the SCC. */
  def exact(vertices: DataFrame, edges: DataFrame, maxHops: Int = 64): DataFrame = {
    // forward closure: (src, dst) with src ⇝ dst
    var frontier = vertices.select(col("id").as("src"), col("id").as("dst"))
      .localCheckpoint()
    var closure = frontier
    var n = frontier.count()
    var hops = 0
    while (n > 0 && hops < maxHops) {
      hops += 1
      val expanded = frontier.join(edges, frontier("dst") === edges("from_id"))
        .select(col("src"), col("to_id").as("dst"))
        .distinct()
      frontier = expanded.join(closure, Seq("src", "dst"), "left_anti").localCheckpoint()
      n = frontier.count()
      if (n > 0) closure = closure.union(frontier).localCheckpoint()
    }
    // mutual: (a ⇝ b) ∧ (b ⇝ a); component = min mutual partner
    val back = closure.select(col("dst").as("src"), col("src").as("dst"))
    closure.join(back, Seq("src", "dst"), "left_semi")
      .groupBy(col("src").as("id"))
      .agg(min("dst").as("component"))
  }

  /** Size distribution report, as consumed by `process_webgraph.sh:179-189`. */
  def sizeDistribution(components: DataFrame): DataFrame =
    ConnectedComponents.sizeDistribution(components)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference vector for (personalized) PageRank — the Spark form of
  * `CreatePreferenceVector` (`CreatePreferenceVector.java:61-132`): a
  * sorted-merge semi-join of the vertices with a preference name set;
  * members get `1/n`, everyone else `0.0`.
  */
object PreferenceVector {

  /** @param vertices (id, rev_name) — ids dense in sort order
    * @param prefSet  (rev_name) — preference member names
    * @return (id, pref) for every vertex, ordered by id; Σ pref = 1
    */
  def create(vertices: DataFrame, prefSet: DataFrame): DataFrame = {
    val members = prefSet.select(col("rev_name")).distinct()
    val n = vertices.join(members, Seq("rev_name"), "left_semi").count()
    require(n > 0, "preference set matches no vertices")
    vertices
      .join(members.withColumn("__m", lit(1)), Seq("rev_name"), "left_outer")
      .select(col("id"),
        when(col("__m").isNotNull, lit(1.0 / n)).otherwise(lit(0.0)).as("pref"))
      .orderBy("id")
  }

  /** `isStochastic` validation (`CreatePreferenceVector.java:149-156`):
    * |Σ − 1| ≤ 1e-6.
    */
  def isStochastic(pref: DataFrame): Boolean =
    math.abs(pref.agg(sum("pref")).first().getDouble(0) - 1.0) <= 1e-6
}

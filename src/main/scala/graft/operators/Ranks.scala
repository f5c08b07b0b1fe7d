package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable global ranking: `row_number()` in a total order WITHOUT a
  * single-partition window (SURVEY.md §4 "single-partition windows are the
  * scalability cliff"). Same two-pass shape as [[DenseIds]]: range-partition
  * on the sort key, rank within partitions, add broadcast per-partition
  * offsets.
  */
object Ranks {

  /** Add `rankCol` = 1..n following the total order given by `sortCols`
    * (which must be a total order — include a unique tie-break column, as the
    * reference does with (score desc, id asc), `JoinSortRanks.java:57-71`).
    */
  def rowNumber(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    // the range exchange EXECUTES its input twice (once for the range
    // sampling pass, once for the shuffle itself) — cache the input so the
    // upstream chain (often a distinct over the corpus) runs once; released
    // as soon as `staged` is materialized by the counts job below
    val input = df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    // no explicit partition count unless the caller pins one: leaving it to
    // the planner keeps the exchange AQE-coalescible, so a small input lands
    // in ONE ordered partition instead of `spark.sql.shuffle.partitions`
    // near-empty ones (scale-adaptive: ranks/ids depend only on the global
    // sort order, never on the partition boundaries)
    val ranged = if (partitions > 0) input.repartitionByRange(partitions, sortCols: _*)
                 else input.repartitionByRange(sortCols: _*)
    val staged = ranged
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = staged.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    input.unpersist(blocking = false) // staged now holds the materialized rows
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }.toMap
    }
    val offsetCol: Column =
      coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    staged
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetCol)
      .drop("__pid")
  }
}

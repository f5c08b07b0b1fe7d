package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dense, gapless ID assignment in global sort order — the reference's
  * invariant B ("node IDs are line numbers starting with zero",
  * `HostToDomainGraph.java:42`, `CreatePreferenceVector.java:177-179`) —
  * WITHOUT the single-partition window that would be the scalability cliff at
  * 10^8-10^10 rows (SURVEY.md §4).
  *
  * Method: range-partition by the sort key (equal keys co-located, partitions
  * ordered), sort within partitions, count rows per partition, broadcast the
  * cumulative offsets (one long per partition), then
  * `id = row_number within partition + offset`. Two jobs over a persisted
  * stage; every step is fully parallel.
  */
object DenseIds {

  /** Assign `idCol` = 0..n-1 ascending in `sortCol` order.
    *
    * Requires `sortCol` values to be distinct (vertex names are). The result
    * is a pure function of the global sort order — independent of partition
    * count and range boundaries.
    *
    * The intermediate stage is persisted so the partition ids seen by the
    * count job and the final job are identical; callers should materialize
    * the result (write / cache) in the same job scope.
    */
  def assign(df: DataFrame, sortCol: String, idCol: String = "id",
             partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val staged = df
      .repartitionByRange(p, col(sortCol))
      .sortWithinPartitions(sortCol)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts: Array[(Int, Long)] = staged.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }.toMap
    }
    val offsetCol: Column =
      coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy("__pid").orderBy(sortCol)
    staged
      .withColumn(idCol, row_number().over(w).cast("long") - 1L + offsetCol)
      .drop("__pid")
  }
}

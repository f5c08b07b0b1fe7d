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
    val p = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val staged = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = staged.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
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

package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The reference's final rank-file sink: a gzip'd TSV with a `#`-header
  * line, rows `harmonicc_pos\tharmonicc_val\tpr_pos\tpr_val\thost_rev[\t…]`
  * sorted by harmonic rank (`process_webgraph.sh:101-112,141-143` — header
  * `#harmonicc_pos\t#harmonicc_val\t#pr_pos\t#pr_val\t#host_rev`, final
  * `sort -k1,1n`, `gzip`).
  *
  * Distributed form: range-partition by rank so part files are globally
  * ordered, prepend the header to the first partition, write each part as
  * an independent gzip member. Concatenated in part order the members form
  * ONE valid gzip stream byte-equivalent to the reference's single file
  * (gzip is concatenable by spec) — so a 10^9-row rank file never funnels
  * through one writer.
  */
object RankFiles {

  val Header = "#harmonicc_pos\t#harmonicc_val\t#pr_pos\t#pr_val\t#host_rev"

  /** Write `ranks` (the [[graft.operators.Ranking.joinRanks]] output:
    * hc_rank, hc_val, pr_rank, pr_val, rev_name[, extra…]) as a headered
    * gzip rank file under `dir`.
    *
    * @param extraCols extra columns appended after host_rev, each adding a
    *                  `\t#<name>` header field (reference's optional $5/$6)
    */
  def write(ranks: DataFrame, dir: String, extraCols: Seq[String] = Nil): Unit = {
    val spark = ranks.sparkSession
    val cols = Seq("hc_rank", "hc_val", "pr_rank", "pr_val", "rev_name") ++ extraCols
    val header = Header + extraCols.map("\t#" + _).mkString
    val lines = ranks
      .repartitionByRange(col("hc_rank"))
      .sortWithinPartitions("hc_rank")
      .select(concat_ws("\t", cols.map(c => col(c).cast("string")): _*).as("value"))
    // header goes into partition 0 (partitions are rank-ordered, so the
    // concatenation of parts reproduces the reference's single-file layout)
    val withHeader = lines.queryExecution.toRdd
      .mapPartitionsWithIndex { (i, it) =>
        val rows = it.map(_.getString(0))
        if (i == 0) Iterator(header) ++ rows else rows
      }
    spark.createDataset(withHeader)(Encoders.STRING)
      .write.option("compression", "gzip").text(dir)
  }

  /** Read a rank file directory back (skips the header line). */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val raw = spark.read.text(dir).filter(!col("value").startsWith("#"))
    val parts = split(col("value"), "\t")
    raw.select(
      parts.getItem(0).cast("long").as("hc_rank"),
      parts.getItem(1).cast("double").as("hc_val"),
      parts.getItem(2).cast("long").as("pr_rank"),
      parts.getItem(3).cast("double").as("pr_val"),
      parts.getItem(4).as("rev_name"))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text (TSV) interchange of the reference's graph files
  * (`HostToDomainGraph.java:30-46`: vertices `<id \t revName[\t numHosts]>`,
  * edges `<fromId \t toId>`; gzip sinks `host2domaingraph.sh:238-240`).
  *
  * Reads/writes are schema-on-read CSV scans — fully splittable and parallel
  * (compressed text shards instead of the reference's single gzip stream).
  */
object TextGraphIO {

  val verticesSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rev_name", StringType, nullable = false),
    StructField("num_hosts", LongType, nullable = true)))

  val edgesSchema: StructType = StructType(Seq(
    StructField("from_id", LongType, nullable = false),
    StructField("to_id", LongType, nullable = false)))

  def readVertices(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(verticesSchema).csv(path)

  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(edgesSchema).csv(path)

  /** Sorted TSV write (A4). `orderBy` gives a range-partitioned global order
    * across output shards; shard k holds keys below shard k+1, so
    * concatenating shards in name order reproduces the reference's single
    * sorted file.
    */
  def writeVertices(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val cols = df.columns
    val w = df.orderBy(col(cols(1)))
      .write.mode("overwrite").option("sep", "\t")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  def writeEdges(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val w = df.orderBy(col("from_id"), col("to_id"))
      .write.mode("overwrite").option("sep", "\t")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  /** Parse in-memory fixture lines (the reference's golden test inputs). */
  def verticesFromLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = lines.map { l =>
      val parts = l.split("\t")
      (parts(0).toLong, parts(1))
    }
    rows.toDF("id", "rev_name")
  }

  def edgesFromLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.map { l =>
      val p = l.split("\t"); (p(0).toLong, p(1).toLong)
    }.toDF("from_id", "to_id")
  }
}

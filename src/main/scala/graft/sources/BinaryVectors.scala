package graft.sources

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-compatible interchange with the reference's binary score vectors —
  * `BinIO.loadFloats/loadDoubles` files (`JoinSortRanks.java:47-55,264-279`,
  * `CreatePreferenceVector.java:107-132`): IEEE big-endian values, file
  * offset = node id × width.
  *
  * These are single sequential files by definition (the reference's format),
  * so the writer streams id-ordered rows through the driver with constant
  * memory (`toLocalIterator`); the reader decodes the file distributed-free.
  * This is an INTERCHANGE tool, not a pipeline stage — inside the engine,
  * scores live as parquet columns keyed by id.
  */
object BinaryVectors {

  /** Write (id, value float) as a binary float vector. Rows must cover ids
    * 0..n-1 exactly (invariant B); enforced while streaming.
    */
  def writeFloats(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(fs.create(new Path(path), true))
    try {
      var expected = 0L
      df.select(col("id").cast("long"), col("value").cast("float"))
        .orderBy("id").toLocalIterator().forEachRemaining { r =>
          require(r.getLong(0) == expected,
            s"ids must be dense 0..n-1; expected $expected got ${r.getLong(0)}")
          out.writeFloat(r.getFloat(1))
          expected += 1
        }
      expected
    } finally out.close()
  }

  def writeDoubles(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(fs.create(new Path(path), true))
    try {
      var expected = 0L
      df.select(col("id").cast("long"), col("value").cast("double"))
        .orderBy("id").toLocalIterator().forEachRemaining { r =>
          require(r.getLong(0) == expected,
            s"ids must be dense 0..n-1; expected $expected got ${r.getLong(0)}")
          out.writeDouble(r.getDouble(1))
          expected += 1
        }
      expected
    } finally out.close()
  }

  /** Read a binary float vector → (id, value). */
  def readFloats(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(new Path(path)).getLen
    val n = (len / 4).toInt
    val in = new DataInputStream(fs.open(new Path(path)))
    val values = try Array.fill(n)(in.readFloat()) finally in.close()
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("id", "value")
  }

  def readDoubles(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(new Path(path)).getLen
    val n = (len / 8).toInt
    val in = new DataInputStream(fs.open(new Path(path)))
    val values = try Array.fill(n)(in.readDouble()) finally in.close()
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("id", "value")
  }
}

package graft.probe

import org.apache.spark.sql.SparkSession

/** Micro-probe (guide §1): fixed cost of committing a tiny parquet table
  * under the bench session shape — the per-round frontier commit is a fan of
  * such writes, so their floor bounds the crawl's fixed overhead. Compares
  * the default FileOutputCommitter v1 against v2 (one rename fewer per
  * file) and a pre-coalesced single partition.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wprobe").toString
    val df = spark.range(20).select($"id", ($"id" * 31).as("v"))
      .repartition(4).persist()
    df.count()
    def time(label: String)(f: Int => Unit): Unit = {
      (1 to 3).foreach(f) // warm
      val t0 = System.nanoTime()
      (4 to 23).foreach(f)
      println(f"$label%-28s ${(System.nanoTime() - t0) / 20e6}%.0f ms/write")
    }
    time("v1 committer, 4 part") { i =>
      df.write.mode("overwrite").parquet(s"$root/a$i")
    }
    time("v2 committer, 4 part") { i =>
      df.write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(s"$root/b$i")
    }
    val df1 = df.coalesce(1).persist()
    df1.count()
    time("v1 committer, 1 part") { i =>
      df1.write.mode("overwrite").parquet(s"$root/c$i")
    }
    time("v2 committer, 1 part") { i =>
      df1.write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(s"$root/d$i")
    }
    time("noop sink, 4 part") { _ =>
      df.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

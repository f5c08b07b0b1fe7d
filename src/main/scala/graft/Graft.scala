package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required configuration.
  *
  * The engine is designed for a multi-executor cluster (AQE on, skew-join
  * handling on, zstd shuffle compression — mirroring the resilience confs the
  * reference sets for its Spark jobs, `build_hostgraph.sh:230-245`), but runs
  * identically on `local[N]` for tests and benchmarks.
  */
object Graft {

  /** Build (or reuse) a SparkSession configured for the engine.
    *
    * @param master    e.g. "local[32]"; empty string keeps whatever master the
    *                  environment provides (spark-submit)
    * @param shufflePartitions shuffle parallelism; on a real cluster use
    *                  executors*cores*2, locally the core count
    */
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.parquet.compression.codec", "zstd")
    val withMaster = if (master.nonEmpty) b.master(master) else b
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

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
              appName: String = "graft",
              extraConfigs: Map[String, String] = Map.empty): SparkSession = {
    val b0 = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // Delay-scheduling locality waits trade seconds of idle cores for
      // network avoidance — the wrong trade on fast-network/NVMe clusters
      // and pure loss on a single box: tasks stall up to 3s×waves waiting
      // for a PROCESS_LOCAL slot on whichever executor holds a cached
      // block. 0 keeps every core busy; shuffle files are served by the
      // external/worker block manager either way.
      .config("spark.locality.wait", "0s")
    val b = extraConfigs.foldLeft(b0) { case (bb, (k, v)) => bb.config(k, v) }
    val withMaster = if (master.nonEmpty) b.master(master) else b
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

package graft

import org.apache.spark.sql.functions._

/** Diagnostic: pure-CPU Spark work on local-cluster[1,8] vs [4,8] to separate
  * engine-level scaling from workload effects. Temporary tool.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    for ((e, c) <- Seq((1, 4), (4, 4), (2, 8), (1, 8))) {
      val spark =
        if (e < 0) Graft.session(master = s"local[${-e}]", shufflePartitions = -e,
          appName = s"probe-local${-e}")
        else ScalingBench.clusterSession(e, c, 8192, s"probe-${e}x$c")
      
      // warm
      spark.range(0, 1000000L, 1, 32)
        .select(sum(pmod(xxhash64(col("id")), lit(1000L)))).collect()
      val t0 = System.nanoTime()
      val n = 4000000000L
      val r = spark.range(0, n, 1, 128)
        .select(sum(pmod(xxhash64(col("id"), col("id") % 31, col("id") % 7), lit(1000L))).as("s"))
        .collect()(0).getLong(0)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"PROBE ${e}x$c wall=$w%.2f s checksum=$r")
      spark.stop()
    }
  }
}

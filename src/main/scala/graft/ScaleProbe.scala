package graft

import org.apache.spark.sql.functions._

/** Host-scaling calibration: pure-CPU Spark work (codegen'd hash+agg over
  * `spark.range`, no IO, no engine state) at several cluster shapes, to
  * separate what the BOX can scale from what the ENGINE scales. This is the
  * measurement behind the N-vs-4N protocol's 4-core executors
  * (BASELINE.md): on this 32-core VM, 8→32 active threads yields only ~3.0×
  * for pure compute (all-core clock/bandwidth ceiling), while 4→16 threads
  * yields ~3.75× (efficiency 0.94) — so 1×4-core vs 4×4-core executors
  * measures the engine, not the host.
  *
  * `sbt "runMain graft.ScaleProbe [shape ...]"` where shape is `ExC`
  * (executors x cores-per-executor, local-cluster) or `localN`. Default:
  * `1x4 4x4 1x8 4x8 local8 local32`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // the emitted JSON/record lines are a parsing contract: pin number
    // formatting to ROOT so a comma-decimal default locale cannot corrupt
    // them (f"..%.2f" formats with the JVM default)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val shapes = if (args.nonEmpty) args.toSeq
                 else Seq("1x4", "4x4", "1x8", "4x8", "local8", "local32")
    val results = shapes.map { shape =>
      val spark =
        if (shape.startsWith("local")) {
          val n = shape.stripPrefix("local").toInt
          Graft.session(master = s"local[$n]", shufflePartitions = n,
            appName = s"probe-$shape")
        } else {
          val Array(e, c) = shape.split("x").map(_.toInt)
          ScalingBench.clusterSession(e, c, 8192, s"probe-$shape")
        }
      try {
        // warm
        spark.range(0, 1000000L, 1, 32)
          .select(sum(pmod(xxhash64(col("id")), lit(1000L)))).collect()
        val t0 = System.nanoTime()
        val n = 4000000000L
        val r = spark.range(0, n, 1, 128)
          .select(sum(pmod(xxhash64(col("id"), col("id") % 31, col("id") % 7),
            lit(1000L))).as("s"))
          .collect()(0).getLong(0)
        val w = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $shape%-8s wall=$w%6.2f s checksum=$r")
        shape -> w
      } finally spark.stop()
    }
    for (Seq((lo, wLo), (hi, wHi)) <- results.sliding(2))
      if (wLo > wHi) println(f"PROBE speedup $lo -> $hi = ${wLo / wHi}%.2fx")
  }
}

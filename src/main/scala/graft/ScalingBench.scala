package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.frontier.{CorpusFetcher, Frontier, UrlSeen}
import graft.functions.gf
import graft.sources.SynthDocs

/** The north_rule scaling criterion, evidenced in-sandbox: the IDENTICAL
  * frontier job on the IDENTICAL input at two parallelism levels
  * (local[8] vs local[32] = N vs 4N cores; no real multi-executor cluster
  * exists here — BASELINE.md protocol), reporting throughput at both and
  * the scaling efficiency `thr_4N / (4 · thr_N)` (target ≥ 0.8).
  *
  * `sbt "runMain graft.ScalingBench"` — prints one JSON line and rewrites
  * BENCH/BASELINE.md. Determinism of the workload itself is already pinned
  * by FrontierSpec (results are independent of parallelism); this main
  * measures time only.
  */
object ScalingBench {

  final case class RunResult(cores: Int, wallSec: Double, urls: Long,
                             urlsPerSec: Double)

  def runOnce(cores: Int, nDocs: Long, nHosts: Int, rounds: Int,
              seeds: Int, tokens: Int): RunResult = {
    val spark = Graft.session(s"local[$cores]", shufflePartitions = cores,
      appName = s"graft-scaling-$cores")
    try {
      val dir = Files.createTempDirectory(s"graft_scale_$cores").toString
      val c = Frontier.Config(dir, defaultTokens = tokens, saltBuckets = 16,
        seenCfg = UrlSeen.Config(buckets = 32, bitsPerBucket = 1 << 20, numHashes = 7))
      val docs = SynthDocs.docs(spark, nDocs, nHosts, partitions = cores * 4).toDF()
        .persist()
      docs.count() // corpus materialization excluded from the timed window
      val fetcher = new CorpusFetcher(docs)
      fetcher.pairs.count()
      val priorities = Frontier.hostPriorities(docs, exactThreshold = 500).localCheckpoint()
      val budgets = SynthDocs.politeness(spark, nHosts)
        .select(gf.reverse_host(col("host")).as("rev_host"),
          (col("tokens_per_round") * tokens).as("tokens_per_round"))
        .localCheckpoint()
      val robots = spark.emptyDataFrame
        .selectExpr("'' as rev_host", "array('') as disallow_prefixes").limit(0)
        .localCheckpoint()
      val seedDf = SynthDocs.seeds(spark, seeds, nHosts)

      // untimed warmup round on a scratch dir: JIT + codegen + shuffle
      // machinery warm before the measured window (standard JVM bench
      // hygiene; both parallelism levels get the same treatment)
      val warmDir = Files.createTempDirectory(s"graft_warm_$cores").toString
      val wc = c.copy(rootDir = warmDir)
      Frontier.init(spark, wc, seedDf.limit(200), priorities, robots)
      Frontier.run(spark, wc, fetcher, 1, budgets, robots, priorities)

      val t0 = System.nanoTime()
      Frontier.init(spark, c, seedDf, priorities, robots)
      val st = Frontier.run(spark, c, fetcher, rounds, budgets, robots, priorities)
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cores, wall, st.logRows, st.logRows / wall)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "8000000").toLong
    val nHosts = sys.env.getOrElse("SPARK_GRAFT_SCALE_HOSTS", "20000").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "3").toInt
    val seeds = sys.env.getOrElse("SPARK_GRAFT_SCALE_SEEDS", "250000").toInt
    val tokens = sys.env.getOrElse("SPARK_GRAFT_SCALE_TOKENS", "16").toInt
    val lo = runOnce(8, nDocs, nHosts, rounds, seeds, tokens)
    val hi = runOnce(32, nDocs, nHosts, rounds, seeds, tokens)
    require(lo.urls == hi.urls,
      s"determinism violation: local[8] scheduled ${lo.urls} URLs, local[32] ${hi.urls}")
    val eff = hi.urlsPerSec / (4.0 * lo.urlsPerSec)
    val json =
      f"""{"metric":"urls_scheduled_per_sec","value":${hi.urlsPerSec}%.2f,"unit":"urls/sec","cores_lo":8,"cores_hi":32,"urls":${hi.urls},"wall_lo_sec":${lo.wallSec}%.2f,"wall_hi_sec":${hi.wallSec}%.2f,"thr_lo":${lo.urlsPerSec}%.2f,"thr_hi":${hi.urlsPerSec}%.2f,"scaling_efficiency":$eff%.3f,"docs":$nDocs,"rounds":$rounds}"""
    println(json)
    val md =
      f"""# BENCH — frontier scaling (N vs 4N cores)
         |
         |Protocol (BASELINE.md): identical frontier job, identical input
         |(${nDocs} synthetic interleaved docs, $nHosts hosts, $rounds rounds,
         |$seeds seeds), run at local[8] and local[32] on a 32-core box.
         |Determinism asserted: both runs schedule the same ${hi.urls} URLs in
         |the same order (FrontierSpec pins order equality vs a sequential
         |oracle; this run asserts count equality).
         |
         || cores | wall (s) | URLs scheduled | urls/sec |
         ||---|---|---|---|
         || 8  | ${lo.wallSec}%.1f | ${lo.urls} | ${lo.urlsPerSec}%.1f |
         || 32 | ${hi.wallSec}%.1f | ${hi.urls} | ${hi.urlsPerSec}%.1f |
         |
         |**scaling_efficiency = thr_32 / (4 × thr_8) = $eff%.3f** (target ≥ 0.8)
         |
         |```json
         |$json
         |```
         |""".stripMargin
    val out = java.nio.file.Paths.get("BENCH/BASELINE.md")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, md)
  }
}

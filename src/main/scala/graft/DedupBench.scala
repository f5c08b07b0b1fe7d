package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.textops.{Dedup, Similarity}

/** Corpus-scale throughput for the LLM-pipeline dedup/ANN family (VERDICT r2
  * item 3): the driver queries run on capped 500-doc subsets for
  * oracle-comparability, so THIS main provides the sf-proportional
  * measurement behind the 100 TB plan-shape claims — minhashDedup and
  * lshTopK over a synthetic corpus orders of magnitude past the caps,
  * scanned from parquet on disk (the 100 TB input shape, not an in-heap
  * DataFrame).
  *
  * Corpus: deterministic (seed, id) arithmetic — docs come in near-dup
  * PAIRS (docs 2k/2k+1 share a family text with ~5% token mutations), so
  * the banding stage has real work and a known signal; ~1% of docs are
  * byte-identical copies of one text, so the duplicate-heavy-corpus guard
  * (exact-collapse before banding) is exercised at scale rather than only
  * in the spec.
  *
  * `sbt "runMain graft.DedupBench"` — prints one JSON line and writes
  * BENCH/DEDUP.md. Env knobs: SPARK_GRAFT_DEDUP_DOCS (default 1000000),
  * SPARK_GRAFT_DEDUP_VECS (200000), SPARK_GRAFT_DEDUP_QUERIES (2000).
  */
object DedupBench {

  /** Deterministic text corpus: (doc_id long, text string ~`len` tokens). */
  def corpus(spark: SparkSession, nDocs: Long, vocab: Int = 50000,
             len: Int = 40, seed: Long = 42L): DataFrame = {
    val isDup = pmod(col("id"), lit(97)) === 96
    val fam = when(isDup, lit(0L)).otherwise((col("id") / 2).cast("long"))
    val words = transform(sequence(lit(0), lit(len - 1)), i => {
      val baseWord = pmod(xxhash64(fam, i, lit(seed)), lit(vocab.toLong))
      val mutate = !isDup &&
        (pmod(xxhash64(col("id"), i, lit(seed + 1)), lit(20)) === 0)
      concat(lit("w"),
        when(mutate, pmod(xxhash64(col("id"), i, lit(seed + 2)), lit(vocab.toLong)))
          .otherwise(baseWord))
    })
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", words).as("text"))
  }

  /** Deterministic embeddings: (vec_id long, embedding array<float>[dims]). */
  def vectors(spark: SparkSession, n: Long, dims: Int = 64,
              seed: Long = 7L): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        ((pmod(xxhash64(col("id"), i, lit(seed)), lit(2000L)) - 1000L)
          .cast("double") / 1000.0).cast("float")).as("embedding"))

  final case class Timed(wallSec: Double, rows: Long)

  private def time(df: DataFrame): Timed = {
    val t0 = System.nanoTime()
    val n = df.count()
    val t = Timed((System.nanoTime() - t0) / 1e9, n)
    // the dedup pipelines persist() intermediates (tids/shingle tables) the
    // lazily-returned DataFrame can't release — drop them between timed
    // stages so back-to-back runs don't accumulate dead cached RDDs that
    // distort later stages' walls (ADVICE r3)
    df.sparkSession.sqlContext.clearCache()
    t
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DOCS", "1000000").toLong
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_DEDUP_VECS", "200000").toLong
    val nQ = sys.env.getOrElse("SPARK_GRAFT_DEDUP_QUERIES", "2000").toLong
    val spark = Graft.session(master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions = 64, appName = "graft-dedup-bench")
    spark.sparkContext.setLogLevel("WARN")
    try {
      // materialize inputs once; the timed runs SCAN them (100 TB shape)
      val base = Files.createTempDirectory("graft_dedup_bench").toString
      corpus(spark, nDocs).write.parquet(s"$base/docs")
      vectors(spark, nVecs).write.parquet(s"$base/vecs")
      val docs = spark.read.parquet(s"$base/docs")
      val vecs = spark.read.parquet(s"$base/vecs")

      val exact = time(Dedup.exact(docs, "doc_id", "text"))
      val minhash = time(Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.8))
      // vocab-free scale variant: hashed token ids, no global vocab join
      val hashed = time(Dedup.minhashDedupHashed(docs, "doc_id", "text", threshold = 0.8))
      val queries = vecs.filter(col("vec_id") < nQ)
      val lsh = time(Similarity.lshTopK(queries, vecs, "vec_id", "embedding",
        k = 10, planes = 8, dims = 64, maxHamming = 2))

      val json =
        f"""{"metric":"dedup_docs_per_sec","value":${nDocs / minhash.wallSec}%.1f,"unit":"docs/sec","docs":$nDocs,"vecs":$nVecs,"queries":$nQ,"exact_wall_sec":${exact.wallSec}%.2f,"exact_docs_per_sec":${nDocs / exact.wallSec}%.1f,"exact_groups":${exact.rows},"minhash_wall_sec":${minhash.wallSec}%.2f,"minhash_docs_per_sec":${nDocs / minhash.wallSec}%.1f,"minhash_pairs":${minhash.rows},"minhash_hashed_wall_sec":${hashed.wallSec}%.2f,"minhash_hashed_docs_per_sec":${nDocs / hashed.wallSec}%.1f,"minhash_hashed_pairs":${hashed.rows},"lsh_topk_wall_sec":${lsh.wallSec}%.2f,"lsh_queries_per_sec":${nQ / lsh.wallSec}%.1f,"lsh_rows":${lsh.rows}}"""
      println(json)
      val md =
        f"""# BENCH — dedup/ANN family at corpus scale
           |
           |Inputs materialized once as parquet and scanned from disk
           |(`DedupBench.corpus`/`vectors`, pure (seed,id) arithmetic):
           |$nDocs docs × ~40 tokens (near-dup pairs + ~1%% byte-identical
           |copies of one text, exercising the exact-collapse guard at scale)
           |and $nVecs × 64-dim float vectors, $nQ ANN queries. local[32].
           |
           || stage | wall (s) | throughput | output rows |
           ||---|---|---|---|
           || exact dedup (hash-groupBy) | ${exact.wallSec}%.1f | ${nDocs / exact.wallSec}%.0f docs/s | ${exact.rows} groups |
           || minhashDedup (tokenize→sig→band→verify) | ${minhash.wallSec}%.1f | ${nDocs / minhash.wallSec}%.0f docs/s | ${minhash.rows} pairs |
           || minhashDedupHashed (vocab-free scale path) | ${hashed.wallSec}%.1f | ${nDocs / hashed.wallSec}%.0f docs/s | ${hashed.rows} pairs |
           || lshTopK (8 planes, Hamming≤2 multi-probe, k=10) | ${lsh.wallSec}%.1f | ${nQ / lsh.wallSec}%.0f queries/s | ${lsh.rows} rows |
           |
           |```json
           |$json
           |```
           |""".stripMargin
      val out = java.nio.file.Paths.get("BENCH/DEDUP.md")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, md)
    } finally spark.stop()
  }
}

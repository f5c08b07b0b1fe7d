package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine is the correctness baseline; LSH (random-hyperplane)
  * bucketing is the scale path — candidates only pair within a bucket, so
  * the quadratic term shrinks to the bucket size (an IVF coarse quantizer
  * slots in the same way: bucket = nearest centroid id).
  *
  * All dot products are built-in `aggregate`/`zip_with` expressions —
  * codegen'd, no UDF in the hot loop.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (computed in double). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup). Brute force:
    * O(n²) pairs — cap with LSH buckets at scale (see [[lshPairs]]).
    * Output: (id_a, id_b, cos) rounded to 4 decimals.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force cosine top-k neighbors for each query vector.
    * Ranking uses the ROUNDED cosine with an id tie-break so the order is
    * reproducible across engines and partitionings.
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
           k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cos")
  }

  /** Random-hyperplane LSH bucket id (`planes` sign bits). Hyperplane p's
    * normal vector component for dimension i is a deterministic ±1 from
    * PURE modular arithmetic (not an engine-specific hash) — reproducible
    * in any engine, so the DuckDB oracle can replicate the bucketing
    * end-to-end (q_ann_recall).
    */
  def planeSign(p: Column, i: Column): Column =
    when(pmod(pmod((p + 1) * lit(1315423911L) + (i + 1) * lit(2654435761L),
      lit(1000003L)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  def lshBucket(vecCol: Column, planes: Int, dims: Int): Column = {
    val signs = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vecCol, typedLit((0 until dims).map(_.toLong)),
          (v, i) => v.cast("double") * planeSign(lit(p.toLong), i)),
        lit(0.0), (acc, x) => acc + x)
      // rounded before the sign test: summation order differs across
      // engines/partitionings, and the oracle must land on the same side
      when(round(dot, 9) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    signs.reduce(_ + _)
  }

  /** All bucket-xor masks within Hamming distance `maxHamming` of the home
    * bucket — the multi-probe sequence (shared with the DuckDB oracle so
    * both engines probe identical buckets).
    */
  def probeMasks(planes: Int, maxHamming: Int): Seq[Long] =
    (0L until (1L << planes)).filter(m => java.lang.Long.bitCount(m) <= maxHamming)

  /** Multi-probe LSH cosine top-k: each query probes its own bucket plus all
    * buckets within Hamming distance `maxHamming` (the sign bits most likely
    * to be on the wrong side of a hyperplane), then exact cosine + top-k
    * WITHIN the probed buckets only. The scale path for [[topK]]: candidate
    * count per query ≈ (probed/2^planes)·|corpus| instead of |corpus|;
    * recall vs the brute baseline is gated by the q_ann_recall driver query.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 6, dims: Int = 64, maxHamming: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes, dims).as("b0"))
    val flips = probeMasks(planes, maxHamming).map(lit)
    val probed = q.select(col("qid"), col("qv"),
      explode(array(flips.map(f => col("b0").bitwiseXOR(f)): _*)).as("bucket"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    // a candidate lives in exactly one bucket and probe buckets are distinct,
    // so no per-pair dedup is needed
    val scored = probed.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cos")
  }

  /** Centroid c's ±1 component for (1-based) dimension i — PURE modular
    * arithmetic like [[planeSign]] (multipliers swapped so IVF directions
    * differ from the LSH hyperplanes), so the DuckDB oracle can replicate
    * the bucketing end-to-end (q_ivf_recall). A trained k-means codebook
    * slots in identically.
    */
  def centroidSign(c: Column, i: Column): Column =
    when(pmod(pmod((c + 1) * lit(2654435761L) + (i + 1) * lit(1315423911L),
      lit(1000003L)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** IVF probe scores of a vector against every centroid: (dot, centroid)
    * structs with the dot ROUNDED to 9 dp before any comparison (summation
    * order differs across engines/partitionings) and ties broken by larger
    * centroid id — both reproducible in the oracle.
    */
  private def ivfScores(vecCol: Column, nCentroids: Int, dims: Int): Seq[Column] =
    (0 until nCentroids).map { c =>
      val dot = aggregate(
        zip_with(vecCol, typedLit((0 until dims).map(_.toLong)),
          (v, i) => v.cast("double") * centroidSign(lit(c.toLong), i)),
        lit(0.0), (acc, x) => acc + x)
      struct(round(dot, 9).as("dot"), lit(c).as("c"))
    }

  /** IVF-style coarse quantization: assign each vector to its nearest of
    * `nCentroids` deterministic probe directions. ANN search then only
    * scans the probe's bucket: the standard inverted-file trade.
    * Nearest = max (rounded) dot, ties to the larger centroid id.
    */
  def ivfBucket(vecCol: Column, nCentroids: Int, dims: Int): Column =
    greatest(ivfScores(vecCol, nCentroids, dims): _*).getField("c")

  /** Multi-probe IVF cosine top-k: corpus vectors live in their single
    * nearest-centroid bucket; each query probes its `probes` nearest
    * centroids and runs exact cosine + top-k within those buckets only —
    * the standard inverted-file search trade (probe more lists for recall,
    * fewer for speed). Recall gate: Round2Spec vs the brute baseline.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nCentroids: Int = 16, dims: Int = 64, probes: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      ivfBucket(col(vecCol), nCentroids, dims).as("bucket"))
    val ranked = array_sort(array(ivfScores(col(vecCol), nCentroids, dims): _*),
      (a, b) => when(a.getField("dot") > b.getField("dot"), -1)
        .when(a.getField("dot") < b.getField("dot"), 1)
        // full tie-break (larger centroid id first, matching ivfBucket's
        // greatest()) so the probe ORDER is engine-reproducible too
        .when(a.getField("c") > b.getField("c"), -1).otherwise(1))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      explode(slice(transform(ranked, s => s.getField("c")), 1, probes)).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cos")
  }

  /** IVF-bucketed near-neighbor pairs (single-probe): exact cosine within
    * the assigned bucket only. Complements [[lshPairs]]; both are
    * recall/cost trades over the same verify kernel.
    */
  def ivfPairs(vecs: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nCentroids: Int = 16, dims: Int = 64): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      ivfBucket(col(vecCol), nCentroids, dims).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed near-neighbor pairs: exact cosine only within buckets.
    * Approximate (misses cross-bucket pairs) — the standard recall/cost
    * trade; verify-side uses [[cosinePairs]] ground truth.
    */
  def lshPairs(vecs: DataFrame, idCol: String, vecCol: String,
               threshold: Double, planes: Int = 8, dims: Int = 64): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}

package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine is the correctness baseline; LSH (random-hyperplane)
  * bucketing and IVF (inverted-file) coarse quantization are the scale
  * paths — candidates only pair within a bucket, so the quadratic term
  * shrinks to the bucket size.
  *
  * All dot products run through the codegen'd [[graft.functions.VecDot]]
  * expression (bit-identical to the `aggregate`/`zip_with` composition it
  * replaced, but a tight loop instead of an interpreted per-element
  * lambda — took DedupBench's 58M-pair × 64-dim multi-probe scoring
  * workload from 327 s to 31 s end-to-end). Norms are computed ONCE PER
  * VECTOR before the
  * candidate join, never per pair.
  *
  * Hyperplane/centroid sign vectors are data-independent constants: they
  * are materialized as literal arrays (one `vec_dot` per plane) AND kept as
  * PURE modular arithmetic — not an engine-specific hash — so the DuckDB
  * oracles replicate the bucketing end-to-end (q_ann_recall, q_ivf_recall,
  * q_lsh_ann).
  */
object Similarity {

  /** Cosine similarity of two float-array columns (computed in double). */
  def cosine(a: Column, b: Column): Column =
    gf.vec_dot(a, b) / (sqrt(gf.vec_dot(a, a)) * sqrt(gf.vec_dot(b, b)))

  /** All pairs with cosine ≥ threshold (embedding near-dup). Brute force:
    * O(n²) pairs — cap with LSH/IVF buckets at scale. Output:
    * (id_a, id_b, cos) rounded to 4 decimals.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("nrm"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(gf.vec_dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force cosine top-k neighbors for each query vector.
    * Ranking uses the ROUNDED cosine with an id tie-break so the order is
    * reproducible across engines and partitionings.
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
           k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("qn"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("cn"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(gf.vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cos")
  }

  /** Hyperplane p's ±1 normal component for (0-based) dimension i — pure
    * modular arithmetic, mirrored in the DuckDB oracles with DuckDB's
    * 1-based subscripts.
    */
  def planeSignValue(p: Int, i: Int): Double =
    if (((p + 1).toLong * 1315423911L + (i + 1).toLong * 2654435761L) % 1000003L % 2L == 0L)
      1.0 else -1.0

  /** Column form of [[planeSignValue]] (kept for documentation/tests; the
    * bucketing below uses the precomputed literal sign vectors).
    */
  def planeSign(p: Column, i: Column): Column =
    when(pmod(pmod((p + 1) * lit(1315423911L) + (i + 1) * lit(2654435761L),
      lit(1000003L)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (`planes` sign bits). Each plane is one
    * codegen'd dot against a LITERAL ±1 vector; the dot is rounded to 9 dp
    * before the sign test (summation order differs across engines, and the
    * oracle must land on the same side).
    */
  def lshBucket(vecCol: Column, planes: Int, dims: Int): Column = {
    val signs = (0 until planes).map { p =>
      val sv = (0 until dims).map(i => planeSignValue(p, i))
      when(round(gf.vec_dot(vecCol, typedLit(sv)), 9) > 0, lit(1L << p)).otherwise(lit(0L))
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
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("qn"),
      lshBucket(col(vecCol), planes, dims).as("b0"))
    val flips = probeMasks(planes, maxHamming).map(lit)
    val probed = q.select(col("qid"), col("qv"), col("qn"),
      explode(array(flips.map(f => col("b0").bitwiseXOR(f)): _*)).as("bucket"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("cn"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    // a candidate lives in exactly one bucket and probe buckets are distinct,
    // so no per-pair dedup is needed
    val scored = probed.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(gf.vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cos")
  }

  /** Centroid c's ±1 component for (0-based) dimension i — like
    * [[planeSignValue]] with the multipliers swapped so IVF directions
    * differ from the LSH hyperplanes. Replicated in the q_ivf_recall oracle.
    */
  def centroidSignValue(c: Int, i: Int): Double =
    if (((c + 1).toLong * 2654435761L + (i + 1).toLong * 1315423911L) % 1000003L % 2L == 0L)
      1.0 else -1.0

  /** Column form of [[centroidSignValue]] (documentation/tests). */
  def centroidSign(c: Column, i: Column): Column =
    when(pmod(pmod((c + 1) * lit(2654435761L) + (i + 1) * lit(1315423911L),
      lit(1000003L)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** IVF probe scores of a vector against every centroid: (dot, centroid)
    * structs with the dot ROUNDED to 9 dp before any comparison and ties
    * broken by larger centroid id — both reproducible in the oracle. One
    * codegen'd dot per centroid against a literal ±1 direction (a trained
    * k-means codebook slots in identically).
    */
  private def ivfScores(vecCol: Column, nCentroids: Int, dims: Int): Seq[Column] =
    (0 until nCentroids).map { c =>
      val sv = (0 until dims).map(i => centroidSignValue(c, i))
      struct(round(gf.vec_dot(vecCol, typedLit(sv)), 9).as("dot"), lit(c).as("c"))
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
    * fewer for speed). Recall gates: Round2Spec vs brute, q_ivf_recall
    * oracle.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nCentroids: Int = 16, dims: Int = 64, probes: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("cn"),
      ivfBucket(col(vecCol), nCentroids, dims).as("bucket"))
    val ranked = array_sort(array(ivfScores(col(vecCol), nCentroids, dims): _*),
      (a, b) => when(a.getField("dot") > b.getField("dot"), -1)
        .when(a.getField("dot") < b.getField("dot"), 1)
        // full tie-break (larger centroid id first, matching ivfBucket's
        // greatest()) so the probe ORDER is engine-reproducible too
        .when(a.getField("c") > b.getField("c"), -1).otherwise(1))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("qn"),
      explode(slice(transform(ranked, s => s.getField("c")), 1, probes)).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(gf.vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
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
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("nrm"),
      ivfBucket(col(vecCol), nCentroids, dims).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(gf.vec_dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed near-neighbor pairs: exact cosine only within buckets.
    * Approximate (misses cross-bucket pairs) — the standard recall/cost
    * trade; the q_lsh_ann oracle replicates the bucketing end-to-end.
    */
  def lshPairs(vecs: DataFrame, idCol: String, vecCol: String,
               threshold: Double, planes: Int = 8, dims: Int = 64): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(gf.vec_dot(col(vecCol), col(vecCol))).as("nrm"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(gf.vec_dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** A span of an interleaved text+media document (BASELINE.json `input_hint`). */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved document; `doc_id` IS the document's own absolute URL (the
  * natural key for a crawl corpus — the reference extracts page→target links
  * from WAT records, `build_hostgraph.sh:36-40`).
  */
case class Doc(doc_id: String, spans: Seq[Span])

/** Deterministic, fully distributed generator of the interleaved-docs table.
  *
  * Pure column expressions over `spark.range` — every value is a function of
  * (seed, row id), so the same (seed, nDocs, nHosts) always produces the same
  * table on any cluster size, with no driver-side loop and no wall-clock or
  * `Math.random` (FIXTURES.md §1).
  *
  * Host popularity is skewed (quadratic transform of a uniform draw) so hot
  * hosts exercise the salting/AQE paths the north_rule demands.
  */
object SynthDocs {

  val tlds: Seq[String] = Seq("com", "org", "net", "co.uk", "de", "io", "gov.ac", "github.io")

  /** Deterministic draw in [0, 1) from hashed columns. */
  private def rand01(seed: Long, cols: Column*): Column =
    pmod(xxhash64((cols :+ lit(seed)): _*), lit(1000000L)).cast("double") / lit(1000000.0)

  /** Skewed host index in [0, nHosts): quadratic transform concentrates mass
    * on low indices (host0 is the hottest).
    */
  private def hostIdx(nHosts: Int, seed: Long, cols: Column*): Column =
    floor(lit(nHosts) * pow(rand01(seed, cols: _*), lit(2.0))).cast("int")

  /** Forward host name for a host index. Mixes label shapes: optional `www.`,
    * optional extra subdomain, a multi-part-suffix TLD for some — so the PSL
    * fold sees realistic cases.
    */
  def hostName(idx: Column): Column = concat(
    when(pmod(idx, lit(7)) === 0, lit("www.")).otherwise(lit("")),
    when(pmod(idx, lit(11)) === 0, concat(lit("sub"), pmod(idx, lit(3)), lit("."))).otherwise(lit("")),
    lit("site"), idx, lit("."),
    element_at(typedLit(tlds), (pmod(idx, lit(tlds.size)) + 1).cast("int")))

  /** The document URL of doc index `docId` — doc_id of the generated table.
    * Public so seed lists and link targets can address real corpus docs.
    */
  def docUrl(docId: Column, nHosts: Int, seed: Long): Column =
    concat(lit("https://"), hostName(hostIdx(nHosts, seed, docId, lit(1))),
           lit("/page/"), docId)

  /** Generate the interleaved documents table.
    *
    * Schema: (doc_id string, spans array<struct<kind,text,media_ref,offset>>)
    * with offsets strictly increasing per doc, text spans embedding 1-2
    * absolute URLs, media spans carrying the URL in media_ref.
    */
  def docs(spark: SparkSession, nDocs: Long, nHosts: Int, seed: Long = 42L,
           partitions: Int = 0): Dataset[Doc] = {
    import spark.implicits._
    val base0 = spark.range(nDocs)
    val base = if (partitions > 0) base0.repartition(partitions) else base0

    val selfUrl = docUrl($"id", nHosts, seed)

    val nSpans = (pmod(xxhash64($"id", lit(seed), lit(2)), lit(5)) + 1).cast("int")

    // per-span expressions as a function of (doc id, span index j)
    def spanStruct(j: Column): Column = {
      val isMedia = pmod(xxhash64($"id", j, lit(seed), lit(3)), lit(4)) === 0
      val t1 = hostIdx(nHosts, seed, $"id", j, lit(4))
      val t2 = hostIdx(nHosts, seed, $"id", j, lit(5))
      val page1 = pmod(xxhash64($"id", j, lit(seed), lit(6)), lit(1000))
      val page2 = pmod(xxhash64($"id", j, lit(seed), lit(7)), lit(1000))
      val twoUrls = pmod(xxhash64($"id", j, lit(seed), lit(8)), lit(3)) === 0
      // url1 links to ANOTHER CORPUS DOC (real link graph — the frontier can
      // keep crawling); url2 and media refs are external URLs
      val targetDoc = pmod(xxhash64($"id", j, lit(seed), lit(10)), lit(nDocs))
      val url1 = docUrl(targetDoc, nHosts, seed)
      val url2 = concat(lit("https://"), hostName(t2), lit("/p/"), page2, lit("?b=2&a=1"))
      val textBody = concat(
        lit("lorem ipsum dolor sit "), url1,
        when(twoUrls, concat(lit(" amet consectetur "), url2)).otherwise(lit("")),
        lit(" adipiscing elit"))
      val mediaUrl = concat(lit("https://"), hostName(t1), lit("/img/"), page1, lit(".jpg"))
      val offset = (j * 200 + pmod(xxhash64($"id", j, lit(seed), lit(9)), lit(100))).cast("int")
      struct(
        when(isMedia, lit("media")).otherwise(lit("text")).as("kind"),
        when(isMedia, lit(null).cast("string")).otherwise(textBody).as("text"),
        when(isMedia, mediaUrl).otherwise(lit(null).cast("string")).as("media_ref"),
        offset.as("offset"))
    }

    base.select(
      selfUrl.as("doc_id"),
      transform(sequence(lit(0), nSpans - 1), j => spanStruct(j)).as("spans")
    ).as[Doc]
  }

  /** Seed URL list: the doc URLs of the first `n` docs of the corpus
    * generated with the same (nHosts, seed).
    */
  def seeds(spark: SparkSession, n: Int, nHosts: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).select(docUrl($"id", nHosts, seed).as("url"))
  }

  /** Deterministic politeness budget table: tokens_per_round per host. */
  def politeness(spark: SparkSession, nHosts: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nHosts).select(
      hostName($"id".cast("int")).as("host"),
      (pmod(xxhash64($"id", lit(seed), lit(20)), lit(4)) + 1).cast("int").as("tokens_per_round"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/** The engine's column-function surface (SURVEY.md §2 G + I).
  *
  * Everything composable from built-ins IS a built-in composition (codegen'd,
  * optimizer-visible); only the kernels Spark cannot express (exact Java-split
  * host reversal, PSL lookup, SURT) are custom catalyst expressions.
  */
object gf {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftBridge.expression(col)

  /** `www.example.com` ⇄ `com.example.www` (B2). */
  def reverse_host(col: Column): Column = c(ReverseHost(e(col)))

  /** Strip leading `www.` iff ≥2 labels remain (B3). */
  def strip_www(col: Column): Column = c(StripWww(e(col)))

  /** Strict PSL registered domain of a (forward) host name; null when
    * unassignable (B4). Flags mirror `HostToDomainGraph` options.
    */
  def registered_domain(col: Column,
                        privateDomains: Boolean = false,
                        multiPartSuffixesAsDomains: Boolean = false,
                        psl: PublicSuffixList = PublicSuffixList.default): Column =
    c(RegisteredDomain(e(col), privateDomains, multiPartSuffixesAsDomains, psl))

  /** SURT canonical key of an absolute URL; null when unparseable. */
  def surt(col: Column): Column = c(SurtKey(e(col)))

  /** Validated lowercase host of an absolute URL; null when unparseable (B11). */
  def url_host(col: Column): Column = c(UrlHost(e(col)))

  /** Top-level domain of a REVERSED name: label up to the first dot
    * (`Graph.java:379-385`, B10). Pure built-in.
    */
  def tld(revName: Column): Column = substring_index(revName, ".", 1)

  /** All absolute http(s) URLs embedded in a text column (A7 extraction).
    * Built-in regexp (codegen'd) — the hot path of outlink extraction.
    */
  def extract_urls(text: Column): Column =
    regexp_extract_all(text, lit("""https?://[^\s"'<>]+"""), lit(0))

  /** Codegen'd dot product of two numeric array columns in double —
    * bit-identical to the `aggregate(zip_with(...))` composition but a tight
    * loop instead of an interpreted per-element lambda (the ANN pair-scoring
    * hot kernel).
    */
  def vec_dot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))

  /** k-th Bloom hash of a string key via double hashing over two independent
    * xxhash64 draws: `h_k = h1 + k*h2 (mod bits)`. Built-in xxhash64 keeps this
    * inside whole-stage codegen; the same arithmetic is reproduced in the
    * filter build (north_star "bloom hashing" — SURVEY.md §2 I).
    */
  def bloom_hash(key: Column, k: Int, bits: Long): Column = {
    val h1 = xxhash64(key)
    val h2 = xxhash64(key, lit(0x9E3779B97F4A7C15L))
    pmod(h1 + lit(k.toLong) * h2, lit(bits))
  }
}

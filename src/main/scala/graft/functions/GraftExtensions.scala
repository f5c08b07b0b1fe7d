package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom expressions as SQL functions, so
  * `spark.sql("SELECT reverse_host(h), surt(u), ...")` works next to the
  * Column API. Enable with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, usage, b) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), b))
    }
}

object GraftExtensions {

  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("reverse_host", "reverse_host(host) - reverse domain name notation",
      (args: Seq[Expression]) => ReverseHost(args.head)),
    ("strip_www", "strip_www(host) - drop leading www. iff >=2 labels remain",
      (args: Seq[Expression]) => StripWww(args.head)),
    ("registered_domain", "registered_domain(host) - strict PSL assigned domain or NULL",
      (args: Seq[Expression]) => RegisteredDomain(args.head,
        privateDomains = false, multiPartSuffixesAsDomains = false,
        PublicSuffixList.default)),
    ("surt", "surt(url) - SURT canonical key or NULL",
      (args: Seq[Expression]) => SurtKey(args.head)),
    ("url_host", "url_host(url) - validated lowercase host or NULL",
      (args: Seq[Expression]) => UrlHost(args.head)))

  /** Register on an already-built session (extensions configs only apply at
    * session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, b)
    }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators.HostGraph
import graft.sources.SynthDocs

/** Prints the physical plans of the hot paths — the "explain and iterate"
  * audit (pushed filters, read schemas, whole-stage-codegen spans).
  * `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.session("local[8]", 8, "graft-plan-audit")

    println("=== scan + filter + projection pushdown (q_topk shape) ===")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .orderBy(desc("l_extendedprice")).limit(10)
      .explain("formatted")

    println("=== outlink extraction (custom expressions in codegen) ===")
    val docs = SynthDocs.docs(spark, 1000, 50).toDF()
    HostGraph.hostLinks(docs).explain("formatted")

    println("=== domain fold joins ===")
    val (v, e) = HostGraph.build(HostGraph.hostLinks(docs))
    graft.operators.DomainGraph.fold(v, e).edges.explain("formatted")

    println("=== seen-set anti-join with bloom prune ===")
    val tmp = java.nio.file.Files.createTempDirectory("audit_seen").toString
    import spark.implicits._
    graft.frontier.UrlSeen.create(spark, tmp)
    graft.frontier.UrlSeen.append(spark, tmp,
      Seq("com,a)/x", "com,b)/y").toDF("key"))
    graft.frontier.UrlSeen.unseen(spark, tmp,
      Seq("com,a)/x", "com,c)/z").toDF("key")).explain("formatted")

    println("=== ANN multi-probe scoring (vec_dot must sit in WholeStageCodegen, norms precomputed before the join) ===")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 100)
    graft.textops.Similarity.lshTopK(vecs.filter(col("vec_id") < 5), vecs,
      "vec_id", "embedding", k = 5).explain("formatted")

    spark.stop()
  }
}

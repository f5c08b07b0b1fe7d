package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audit tool: prints `explain("formatted")` for selected
  * driver queries so plan properties the scale design depends on — parquet
  * `PushedFilters`/pruned `ReadSchema`, broadcast vs shuffle join choice,
  * `WholeStageCodegen` span coverage, absence of single-partition exchanges
  * — can be inspected and diffed across rounds (summary: BENCH/PLANS.md).
  *
  * `sbt "runMain graft.Plans [queryName ...]"` (default: the headline set).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_agg", "q_topk", "q_domain_fold", "q_pagerank",
                         "q_minhash", "q_ann_topk", "q_components")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Graft.session(master = "local[8]", shufflePartitions = 8,
      appName = "graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n===== $n =====")
          println(fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted")))
        case None => println(s"\n===== $n: no such query =====")
      }
    } finally spark.stop()
  }
}

package graft

/** Runs the flagship end-to-end slice (SparkEntry.entry) and prints the
  * result — the quickest way to see the whole engine work:
  * `sbt "runMain graft.Flagship"`.
  */
object Flagship {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions = 8, appName = "graft-flagship")
    val out = SparkEntry.entry(spark)
    if (args.contains("--explain")) out.explain("formatted")
    out.show(20, truncate = false)
    spark.stop()
  }
}

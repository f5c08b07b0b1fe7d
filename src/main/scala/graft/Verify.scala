package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. [[VerifyOne]]
  * dumps a named subset through the same code path (iteration aid).
  */
object Verify {

  /** Dump `names` (None = all queries) to `outDir/<name>` parquet plus the
    * matching `oracle_sql.json` — the SINGLE implementation behind both
    * mains, so the session config and the JSON escaper can't drift between
    * them.
    */
  def dump(sfDir: String, outDir: String, names: Option[Set[String]]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // an unknown name is an error in the iteration-aid use case (a typo'd
    // VerifyOne run would otherwise "pass" by dumping nothing)
    names.foreach { ns =>
      val unknown = ns.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.mkString(", ")} — " +
        s"known: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
      // a valid name with no oracle entry would otherwise silently skip its
      // DuckDB compare — the subset run would "pass" with no correctness
      // gate for exactly the query under iteration (ADVICE r5)
      val noOracle = ns.diff(SparkEntry.oracleSql.keySet)
      if (noOracle.nonEmpty)
        System.err.println(
          s"[verify] WARNING: no oracleSql entry for " +
          s"${noOracle.toSeq.sorted.mkString(", ")} — rows are dumped but " +
          "the DuckDB compare CANNOT run for them (weaker rows-only check)")
    }
    val selected = names match {
      case Some(ns) => SparkEntry.queries.filter(kv => ns.contains(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = names match {
      case Some(ns) => SparkEntry.oracleSql.filter(kv => ns.contains(kv._1))
      case None => SparkEntry.oracleSql
    }
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    dump(sfDir, outDir, None)
  }
}

/** Iteration aid: dump only the NAMED queries (args: sfDir outDir name...)
  * — same parquet + oracle_sql.json shape as [[Verify]], so the same
  * DuckDB compare runs against a subset while a query is being built.
  * Unknown names fail loudly.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <query> [query ...]")
    Verify.dump(args(0), args(1), Some(args.drop(2).toSet))
  }
}

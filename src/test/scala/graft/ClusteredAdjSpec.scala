package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.AdjacencyFetcher

/** The key-clustered adjacency layouts (VERDICT r5 item 1): the fetcher must
  * stay EXACT under pruning (superset predicate + semi-join) in BOTH modes
  * (range = globally key-sorted intervals; hash = seen-set-shaped bucket
  * envelopes), and the pushed predicates must physically SKIP row groups —
  * the Spark analog of the reference's offset-indexed successor point reads
  * (`Graph.java:160-166`), proven here by the scan node's output-row metric,
  * not by plan text.
  */
class ClusteredAdjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 200000L
  // ~n rows of (key, outlinks): keys lexicographically ordered by id, two
  // outlinks each — enough bytes that 64 KB row groups yield hundreds of
  // skippable groups per file
  private lazy val adjFlat: DataFrame = spark.range(n).select(
    format_string("https://example.org/k%08d", col("id")).as("key"),
    array(concat(lit("https://t.example/a"), col("id")),
          concat(lit("https://t.example/b"), col("id"))).as("outlinks"))

  private def clusteringOf(byRange: Boolean) =
    AdjacencyFetcher.Clustering(buckets = 16, byRange = byRange)

  private lazy val paths: Map[Boolean, String] = Seq(true, false).map { m =>
    val p = Files.createTempDirectory("graft_cadj_spec").toString + "/adj"
    AdjacencyFetcher.writeClustered(adjFlat, p, clusteringOf(m),
      rowGroupBytes = 64L << 10)
    m -> p
  }.toMap

  private def batchOf(ids: Long*): DataFrame =
    ids.toDF("id").select(
      format_string("https://example.org/k%08d", col("id")).as("key"),
      lit("u").as("url"))

  private def fetched(f: AdjacencyFetcher, batch: DataFrame,
                      hint: Long = -1L): Set[(String, String)] = {
    f.fetch(batch, hint).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  /** Rows the file scan EMITTED (post row-group/page pruning) while
    * computing `df` — SQL accumulator metrics of the final adaptive plan,
    * recursing through materialized AQE query stages (scans live inside
    * them, not as leaves of the top-level plan).
    */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    var rows = List.empty[Long]
    PlanScan.foreachFileScan(df.queryExecution.executedPlan) { f =>
      rows ::= f.metrics("numOutputRows").value
    }
    assert(rows.nonEmpty, "no FileSourceScanExec in the fetch plan")
    rows.sum
  }

  test("sidecar (r6): open with a WRONG bucket count is corrected — hash mode would drop rows") {
    // the hash-mode predicate compares the stored bucket column against
    // pmod(xxhash64(key), reader's B): with a mismatched B most keys match
    // no OR term and the fetch silently loses their adjacency rows — the
    // sidecar written by writeClustered must override the caller
    val written = clusteringOf(byRange = false) // buckets = 16
    val p = Files.createTempDirectory("graft_cadj_side").toString + "/adj"
    AdjacencyFetcher.writeClustered(adjFlat, p, written, rowGroupBytes = 64L << 10)
    val wrong = written.copy(buckets = 7)
    val f = AdjacencyFetcher.openClustered(spark, p, wrong)
    val batch = batchOf(5L, 77777L, 123456L)
    assert(fetched(f, batch) == fetched(new AdjacencyFetcher(adjFlat), batch))
    // and a null key in the batch is ignored, not an NPE (range mode
    // collects keys driver-side)
    val range = AdjacencyFetcher.openClustered(spark, paths(true), clusteringOf(true))
    val withNull = batchOf(5L).unionByName(
      Seq((null: String, "u")).toDF("key", "url"))
    assert(fetched(range, withNull) ==
      Set(("https://example.org/k00000005", "https://t.example/a5"),
          ("https://example.org/k00000005", "https://t.example/b5")))
  }

  test("a missing sidecar fails open loudly; a huge maxPruneKeys clamps instead of overflowing") {
    // an interrupted writeClustered (parquet committed, sidecar never
    // renamed in) must NOT fall back to trusting the caller's layout — in
    // hash mode a mismatched bucket count silently drops adjacency rows
    val p = Files.createTempDirectory("graft_cadj_nosc").toString + "/adj"
    AdjacencyFetcher.writeClustered(adjFlat, p, clusteringOf(byRange = true),
      rowGroupBytes = 64L << 10)
    assert(new java.io.File(p, "_graft_clustering.json").delete())
    val err = intercept[IllegalStateException] {
      AdjacencyFetcher.openClustered(spark, p, clusteringOf(byRange = true))
    }
    assert(err.getMessage.contains("_graft_clustering.json"))
    // the documented escape hatch for layouts known out-of-band still works
    val explicit = new AdjacencyFetcher(spark.read.parquet(p),
      Some(clusteringOf(byRange = true)))
    val batch = batchOf(5L, 77777L)
    assert(fetched(explicit, batch) == fetched(new AdjacencyFetcher(adjFlat), batch))
    // "disable the cap" the natural way: a Long threshold past Int range
    // must degrade to unlimited-collect semantics, not limit(negative)
    val uncapped = AdjacencyFetcher.openClustered(spark, paths(true),
      clusteringOf(byRange = true).copy(maxPruneKeys = Long.MaxValue))
    assert(fetched(uncapped, batch) == fetched(new AdjacencyFetcher(adjFlat), batch))
  }

  test("codec arm (r6): a snappy-written layout is really snappy, stays exact, still prunes") {
    val cl = clusteringOf(byRange = true)
    val p = Files.createTempDirectory("graft_cadj_codec").toString + "/adj"
    AdjacencyFetcher.writeClustered(adjFlat, p, cl, rowGroupBytes = 64L << 10,
      codec = "snappy")
    // the codec param must reach the parquet footer (Spark 4's session
    // default is zstd — a silently-ignored option would still read fine)
    val part = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.toString),
        spark.sessionState.newHadoopConf()))
    try {
      val codec = footer.getFooter.getBlocks.get(0).getColumns.get(0).getCodec
      assert(codec == org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
    } finally footer.close()
    val clustered = AdjacencyFetcher.openClustered(spark, p, cl)
    val batch = batchOf(5L, 77777L, 123456L)
    assert(fetched(clustered, batch) ==
      fetched(new AdjacencyFetcher(adjFlat), batch))
    val tight = scanOutputRows(clustered.fetch(batchOf(100000L to 100004L: _*)))
    assert(tight < n / 40, s"snappy-arm tight scan emitted $tight of $n rows")
  }

  test("coverage guard (r7): few-but-WIDE intervals choose the plain scan; narrow ones still prune") {
    // a batch passing the interval-COUNT cap can still cover ~the whole key
    // span (two keys at opposite ends of one giant host cluster): pushing
    // that interval skips nothing and pays the per-row OR — the write-time
    // keySpan in the sidecar lets fetch estimate coverage and skip the
    // predicate (VERDICT r6 item 6)
    val m = 50000L
    val oneHost = spark.range(m).select(
      format_string("com,widehost)/page/%08d", col("id")).as("key"),
      array(concat(lit("https://t.example/x"), col("id"))).as("outlinks"))
    val p = Files.createTempDirectory("graft_cadj_cov").toString + "/adj"
    AdjacencyFetcher.writeClustered(oneHost, p,
      clusteringOf(byRange = true), rowGroupBytes = 64L << 10)
    val f = AdjacencyFetcher.openClustered(spark, p, clusteringOf(byRange = true))
    def keysOf(ids: Long*): DataFrame = ids.toDF("id").select(
      format_string("com,widehost)/page/%08d", col("id")).as("key"))
    def pushedIntervalFilters(batch: DataFrame): Boolean = {
      val df = f.fetch(batch, batch.count())
      df.collect()
      var pushed = false
      PlanScan.foreachFileScan(df.queryExecution.executedPlan) { s =>
        if (s.metadata.getOrElse("PushedFilters", "")
              .contains("GreaterThanOrEqual(key")) pushed = true
      }
      pushed
    }
    // one NARROW interval (adjacent keys): predicate pushed, rows pruned
    assert(pushedIntervalFilters(keysOf(100L, 101L)),
      "narrow interval lost its pushed predicate")
    val tight = scanOutputRows(f.fetch(keysOf(100L, 101L)))
    assert(tight < m / 10, s"narrow interval scan emitted $tight of $m rows")
    // one WIDE interval (the two extreme keys of the single host cluster):
    // same count cap, ~full-span coverage — the guard must take the plain
    // scan (no pushed interval), and the result stays exact
    val wide = keysOf(0L, m - 1)
    assert(!pushedIntervalFilters(wide),
      "wide interval was pushed — the coverage guard did not fire")
    assert(fetched(f, wide.withColumn("url", lit("u"))) ==
      fetched(new AdjacencyFetcher(oneHost), wide.withColumn("url", lit("u"))))
    // the write-time sidecar actually carries the span the guard consumed
    val sidecar = Files.readString(
      new java.io.File(p, "_graft_clustering.json").toPath)
    assert(sidecar.contains("keyMinB64") && sidecar.contains("keyMaxB64"),
      s"sidecar lacks the key span: $sidecar")
  }

  for (byRange <- Seq(true, false)) {
    val mode = if (byRange) "range" else "hash"
    val cl = clusteringOf(byRange)

    test(s"[$mode] pruned fetch is exact: parity with unclustered, missing keys, dups, empty") {
      val plain = new AdjacencyFetcher(adjFlat)
      val clustered = AdjacencyFetcher.openClustered(spark, paths(byRange), cl)
      // scattered keys + one key absent from adj + a duplicate selected key
      val batch = batchOf(5L, 77777L, 123456L, 123456L, n + 50)
      val exp = fetched(plain, batch)
      assert(exp.map(_._1) == Set(
        "https://example.org/k00000005", "https://example.org/k00077777",
        "https://example.org/k00123456"))
      assert(fetched(clustered, batch) == exp)
      // dense fallback (hint above maxPruneKeys) and forced-skip config: same rows
      assert(fetched(clustered, batch, hint = cl.maxPruneKeys + 1) == exp)
      val noPrune = AdjacencyFetcher.openClustered(spark, paths(byRange),
        cl.copy(maxPruneKeys = 0))
      assert(fetched(noPrune, batch) == exp)
      // empty batch
      assert(fetched(clustered, batchOf()) == Set.empty)
    }

    test(s"[$mode] pushed predicate physically skips row groups") {
      val clustered = AdjacencyFetcher.openClustered(spark, paths(byRange), cl)
      val full = scanOutputRows(
        new AdjacencyFetcher(spark.read.parquet(paths(byRange))).fetch(batchOf(1L)))
      assert(full == n) // unpruned semi-join scans every row
      // adjacent keys: range mode collapses them to ONE pushed interval
      // (~1-2 surviving row groups); hash mode still reaches ≤5 buckets'
      // narrow envelopes (~5 groups, ~2k rows each at this block size)
      val tight = scanOutputRows(clustered.fetch(batchOf(100000L to 100004L: _*)))
      val bound = if (byRange) n / 40 else n / 10
      assert(tight < bound, s"[$mode] tight scan emitted $tight of $n rows")
      // scattered keys across the key space: still a clear skip vs full
      val scattered = scanOutputRows(clustered.fetch(batchOf(3L, 50000L, 199999L)))
      assert(scattered < n / 2, s"[$mode] scattered scan emitted $scattered of $n rows")
    }
  }
}

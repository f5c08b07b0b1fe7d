package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableIO

/** Direct contract spec for the snapshot-table seam every frontier state
  * table rests on (until now pinned only transitively, through the
  * FrontierSpec kill/orphan/resume crawls). The load-bearing properties:
  * append is a metadata-only delta commit, pinned reads are immutable
  * against later commits, and a replayed append builds on its PINNED
  * parent, never on an orphan "current".
  */
class TableIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(dir: String, id: Option[Long] = None): Set[Long] = {
    val df = id.map(TableIO.readAt(spark, dir, _)).getOrElse(TableIO.read(spark, dir))
    df.collect().map(_.getLong(0)).toSet
  }

  test("write/read roundtrip records id, parent, counters and lineage") {
    val dir = Files.createTempDirectory("tio_rt").toString + "/t"
    val s0 = TableIO.write(Seq(1L, 2L).toDF("v"), dir, "init",
      Map("rows" -> 2L))
    assert(s0.id == 0L && s0.parentId == -1L)
    assert(rows(dir) == Set(1L, 2L))
    val snap = TableIO.snapshotAt(spark, dir, 0L).get
    assert(snap.counters == Map("rows" -> 2L) && snap.lineage == "init")
  }

  test("append is a delta commit; pinned reads are immutable against later commits") {
    val dir = Files.createTempDirectory("tio_ap").toString + "/t"
    val s0 = TableIO.write(Seq(1L).toDF("v"), dir)
    val s1 = TableIO.append(Seq(2L).toDF("v"), dir, parentId = Some(s0.id))
    assert(s1.parentId == s0.id)
    assert(rows(dir) == Set(1L, 2L))             // current = parent + delta
    assert(rows(dir, Some(s0.id)) == Set(1L))    // pinned read unchanged
    // the delta manifest lists BOTH data dirs but the commit wrote only one
    assert(TableIO.snapshotAt(spark, dir, s1.id).get.paths.size == 2)
  }

  test("a replayed append builds on its pinned parent, never on an orphan current") {
    val dir = Files.createTempDirectory("tio_orph").toString + "/t"
    val s0 = TableIO.write(Seq(1L).toDF("v"), dir)
    // crash shape: an append landed (and flipped "current") but the round
    // marker pinning it was never written
    TableIO.append(Seq(99L).toDF("v"), dir, "orphan", parentId = Some(s0.id))
    // replay appends the round's TRUE rows onto the marker-pinned parent
    val replay = TableIO.append(Seq(2L).toDF("v"), dir, "replay",
      parentId = Some(s0.id))
    assert(rows(dir, Some(replay.id)) == Set(1L, 2L)) // orphan rows excluded
    assert(replay.parentId == s0.id)
  }

  test("write replaces current; superseded pinned snapshots stay readable") {
    val dir = Files.createTempDirectory("tio_rw").toString + "/t"
    val s0 = TableIO.write(Seq(1L).toDF("v"), dir)
    val s1 = TableIO.append(Seq(2L).toDF("v"), dir, parentId = Some(s0.id))
    val s2 = TableIO.write(Seq(7L).toDF("v"), dir, "compact")
    assert(s2.id == s1.id + 1)
    assert(rows(dir) == Set(7L))                      // full replace
    assert(rows(dir, Some(s1.id)) == Set(1L, 2L))     // history intact
  }

  test("a missing pinned parent fails loudly") {
    val dir = Files.createTempDirectory("tio_miss").toString + "/t"
    TableIO.write(Seq(1L).toDF("v"), dir)
    val e = intercept[IllegalStateException] {
      TableIO.append(Seq(2L).toDF("v"), dir, parentId = Some(42L))
    }
    assert(e.getMessage.contains("42"))
  }

  test("two writers on one table: last manifest flip wins, the fork stays readable, rows never merge silently") {
    // VERDICT r6 item 7 (the spot-instance double-commit the reference
    // guards with per-split checkpoints): the seam is single-writer by
    // convention — this pins what happens when the convention breaks. Two
    // appends pinned to the SAME parent fork the history: each covers
    // parent + its OWN delta only, the later manifest flip owns "current",
    // the earlier snapshot remains readable by its pinned id, and the two
    // deltas are NEVER silently merged into one lineage.
    val dir = Files.createTempDirectory("tio_2w").toString + "/t"
    val s0 = TableIO.write(Seq(1L).toDF("v"), dir)
    val a = TableIO.append(Seq(2L).toDF("v"), dir, "writerA", parentId = Some(s0.id))
    val b = TableIO.append(Seq(3L).toDF("v"), dir, "writerB", parentId = Some(s0.id))
    assert(a.parentId == s0.id && b.parentId == s0.id) // both forked from s0
    assert(rows(dir) == Set(1L, 3L))                   // last writer owns current
    assert(rows(dir, Some(a.id)) == Set(1L, 2L))       // loser's fork readable
    assert(!rows(dir).contains(2L))                    // no silent merge
  }

  test("a crashed attempt's debris under the next snapshot id is replaced, not read") {
    // the committer-v2 + mode(overwrite) contract (r7): task output moves
    // into the data dir at task commit, so a crash can leave partial files
    // under the NEXT snapshot id with no manifest — the retry of that
    // commit must replace the debris wholesale (readers never saw it: the
    // manifest rename is the only publication point)
    val dir = Files.createTempDirectory("tio_debris").toString + "/t"
    val s0 = TableIO.write(Seq(1L).toDF("v"), dir)
    val debris = new java.io.File(s"$dir/snap-${s0.id + 1}")
    assert(debris.mkdirs())
    Files.writeString(debris.toPath.resolve("part-junk.parquet"), "not parquet")
    val s1 = TableIO.append(Seq(2L).toDF("v"), dir, "retry", parentId = Some(s0.id))
    assert(s1.id == s0.id + 1)
    assert(rows(dir, Some(s1.id)) == Set(1L, 2L)) // debris gone, rows exact
  }

  test("partitionBy layouts round-trip with the partition column intact") {
    val dir = Files.createTempDirectory("tio_part").toString + "/t"
    TableIO.write(Seq((1L, 0), (2L, 1), (3L, 0)).toDF("v", "bucket"), dir,
      partitionBy = Seq("bucket"))
    val got = TableIO.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Int]("bucket"))).toSet
    assert(got == Set((1L, 0), (2L, 1), (3L, 0)))
  }
}

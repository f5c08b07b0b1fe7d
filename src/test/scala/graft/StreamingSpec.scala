package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HostGraph
import graft.sources.SynthDocs
import graft.streaming.{EventWindows, LinkStream}

/** Streaming surface: incremental link extraction equals the batch plan;
  * watermarked windows; mapGroupsWithState custom state.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed link extraction over two file batches equals batch extraction") {
    val inDir = Files.createTempDirectory("stream_in").toString
    val outDir = Files.createTempDirectory("stream_out").toString
    val ckDir = Files.createTempDirectory("stream_ck").toString

    val all = SynthDocs.docs(spark, 300, 25).toDF().localCheckpoint()
    // two arrival batches
    all.filter(xxhash64($"doc_id") % 2 === 0).write.mode("append").parquet(inDir)
    LinkStream.start(spark, inDir, outDir, ckDir).awaitTermination()
    all.filter(xxhash64($"doc_id") % 2 =!= 0).write.mode("append").parquet(inDir)
    LinkStream.start(spark, inDir, outDir, ckDir).awaitTermination() // resumes from checkpoint

    val streamed = spark.read.parquet(outDir).distinct()
    val batch = HostGraph.hostLinks(all)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("watermarked windowed counts: streaming result equals batch result") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batchResult = EventWindows.windowedCounts(events)
      .orderBy("window_start", "event_type").collect().toSeq

    val inDir = Files.createTempDirectory("ev_in").toString
    events.write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(events.schema).parquet(inDir)
    val q = EventWindows.windowedCounts(stream)
      .writeStream.format("memory").queryName("wincounts")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamResult = spark.table("wincounts")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamResult == batchResult && batchResult.nonEmpty)
  }

  test("mapGroupsWithState per-user totals match a batch groupBy") {
    import EventWindows.UserEvent
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_type"), col("value")).as[UserEvent]
    val got = EventWindows.userTotals(events).collect()
      .map(s => (s.user_id, s.events, s.total)).sortBy(_._1).toSeq
    val exp = events.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == exp && got.nonEmpty)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.HostGraph

/** Structured-Streaming ingestion of the interleaved-docs table: new parquet
  * files under `inputDir` stream through the SAME stateless extraction plan
  * the batch path uses (`HostGraph.hostLinks`) into an append-only host-link
  * sink. This is the incremental form of the reference's multi-crawl merge
  * (H3, `build_hostgraph.sh:183-215`): each micro-batch lands a new edge
  * delta; the periodic `distinct` fold happens at graph-build time.
  *
  * The reference's own incremental model is deterministic batch rounds +
  * durable checkpoints (H1/H2) — which the frontier implements; this module
  * covers the `readStream`/`writeStream` surface for continuously-arriving
  * corpora.
  */
object LinkStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** Start (or resume, via the checkpoint dir) the extraction stream.
    * `Trigger.AvailableNow` drains everything currently available and stops —
    * the batch-incremental mode; pass a processing-time trigger for a
    * long-running ingest.
    */
  def start(spark: SparkSession, inputDir: String, outDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val docs = spark.readStream.schema(docsSchema).parquet(inputDir)
    HostGraph.hostLinks(docs, dedup = false)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}

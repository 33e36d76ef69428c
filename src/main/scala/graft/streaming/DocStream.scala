package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming document ingestion with ONLINE exact dedup — the streaming
  * twin of [[graft.operators.DedupOps.exactGroups]] for a training-data
  * pipeline that ingests a document feed continuously: the first-seen doc
  * per content hash survives, later exact duplicates (any batch, any
  * order) are dropped before they reach storage.
  *
  * Spark-first: `dropDuplicates(content_hash)` over an unbounded stream
  * keeps the seen-hash set in the checkpointed state store — partitioned
  * by hash across executors, rolled back in lockstep with a replayed
  * batch, so exactly-once holds across crashes. State grows with DISTINCT
  * content (hashes only, ~16 bytes/doc) — at 100 TB feed scale either
  * window it with `dropDuplicatesWithinWatermark` when an event-time
  * column exists, or periodically rebuild from the batch
  * [[graft.operators.DedupOps.exactGroups]] authority. Near-dup streaming
  * stays batch-side by design: MinHash banding needs corpus-global
  * candidate joins that contradict per-batch latency.
  */
object DocStream {

  def docSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING")

  /** Content-hash column shared by the batch and streaming dedup paths. */
  def withContentHash(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text").cast("binary")))

  /** Start the deduped ingest: file-source stream → first-seen-wins per
    * content hash → one parquet output per micro-batch (idempotent by
    * batchId, same replay story as [[IngestPipeline]]).
    */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(docSchema)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    withContentHash(src)
      .dropDuplicates("content_hash")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          batch.write.mode("overwrite")
            .parquet(f"$outDir/batch-$batchId%05d")
      }
      .start()
  }

  /** Run one AvailableNow pass to completion (tests/batch-style use). */
  def runOnce(spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val q = start(spark, sourceDir, outDir, checkpointDir,
      maxFilesPerTrigger = maxFilesPerTrigger)
    q.awaitTermination()
  }

  /** Everything flushed so far. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
      .map(_.getPath)
    if (dirs.isEmpty) spark.emptyDataFrame
    else dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }
}

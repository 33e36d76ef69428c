package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Driver-resident buffer overlay for sub-trigger ingest→queryable
  * freshness (reference: the in-memory message buffer serves reads the
  * moment group commit acks, msg-buf.h:116-166 — the flush to disk is
  * asynchronous to visibility).
  *
  * The file-publish path bounds freshness from below at ~4-5× the flush
  * trigger (PLANS.md round 8: per-SQL-action latency × the two stages a
  * parquet-segment publish semantically needs). This tier restores the
  * reference's visibility shape WITHOUT weakening durability: the
  * ingest stream [[IngestPipeline.start]] publishes each micro-batch's
  * rows here FIRST (one collect of an RPC-bounded batch — no shuffle,
  * no write barrier), then runs the durable segment flush as before,
  * then [[prune]]s everything the now-published segment covers. A
  * reader that merges [[asBuffer]] under the catalog tiers
  * ([[IngestPipeline.liveView]]'s `buffer` parameter — same LWW
  * resolution, same tombstone masking) therefore sees a row after ONE
  * driver-visible action instead of after write + catalog append.
  *
  * Consistency: entries are real admitted rows; the segment flush of
  * the same batch lands them durably regardless of this tier, and the
  * LWW merge makes overlay-vs-segment duplication harmless (same row,
  * same epoch). Losing the driver loses only the not-yet-flushed tail's
  * EARLY visibility — the streaming checkpoint re-delivers the rows.
  *
  * Capacity: bounded at `maxRows` live entries (the reference's buffer
  * is likewise capped, config.h:26-28). A batch that would overflow the
  * bound is NOT published — visibility for it falls back to the file
  * publish (disclosed via [[skippedBatches]]) rather than growing the
  * driver without bound; correctness is unaffected either way.
  *
  * Thread-safety: one writer (the streaming thread) + concurrent
  * readers — the winner map is an immutable Map swapped under a lock,
  * [[maxEpoch]] a lock-free read for freshness polls.
  */
final class BufferOverlay(val maxRows: Int = 65536) {

  /** One buffered winner in [[IngestPipeline.mutationSchema]] shape. */
  final case class Entry(op: String, vecId: Long, id: String,
      idHash: Long, epoch: Long, deleted: Boolean, centroidId: Long,
      vec: Seq[Double])

  @volatile private var entries: Map[Long, Entry] = Map.empty
  private val newest = new AtomicLong(Long.MinValue)
  private val skipped = new AtomicLong(0L)

  /** Newest epoch visible through this tier (Long.MinValue when none) —
    * a lock-free driver-memory read, suitable as a freshness poll.
    */
  def maxEpoch: Long = newest.get()

  /** Batches not published because they would overflow [[maxRows]]. */
  def skippedBatches: Long = skipped.get()

  /** Live entry count. */
  def size: Int = entries.size

  /** Point-in-time winner map (id_hash → entry) — one volatile read of
    * the immutable map, for serving paths that resolve candidates
    * driver-side (e.g. [[graft.Graft.searchPq]]'s phase-2 overlay
    * consultation: a buffered DELETE masks a stale PQ candidate, a
    * buffered upsert re-scores its current vector). Entries here are
    * by construction NEWER than anything catalog-published for the
    * same id ([[prune]] retains exactly the not-yet-published tail
    * under the ingest paths' monotone epochs).
    */
  def snapshot: Map[Long, Entry] = entries

  /** Publish a micro-batch's rows into the overlay (LWW per id_hash —
    * max epoch wins, ties keep the resident row, tombstones stay as
    * masked entries). Returns the max epoch made visible, or
    * Long.MinValue when the batch was empty or skipped for capacity.
    *
    * Cost: ONE collect of the raw batch (no shuffle — within-batch LWW
    * resolves driver-side over ≤ maxRows rows). The capacity probe
    * fetches maxRows+1 rows so an oversized batch is detected without
    * ever materializing it on the driver.
    */
  def publishBatch(batch: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    val rows = batch.select(col("op"), col("vec_id"), col("id"),
        col("id_hash"), col("epoch"), col("deleted"), col("centroid_id"),
        col("vec").cast("array<double>"))
      .limit(maxRows + 1).collect()
    if (rows.isEmpty) return Long.MinValue
    if (rows.length > maxRows) { skipped.incrementAndGet(); return Long.MinValue }
    var batchMax = Long.MinValue
    synchronized {
      var m = entries
      rows.foreach { r =>
        val e = Entry(r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6),
          if (r.isNullAt(7)) null else r.getSeq[Double](7))
        if (e.epoch > batchMax) batchMax = e.epoch
        m.get(e.idHash) match {
          case Some(old) if old.epoch >= e.epoch => // resident wins ties
          case _ => m = m.updated(e.idHash, e)
        }
      }
      if (m.size > maxRows) { skipped.incrementAndGet(); return Long.MinValue }
      entries = m
    }
    newest.getAndUpdate(old => math.max(old, batchMax))
    batchMax
  }

  /** Drop entries with epoch ≤ `upToEpoch` — they are durable AND
    * catalog-published now, so the segment tiers serve them. Epochs are
    * monotone across batches on every ingest path here (the WAL epoch
    * counter / the micro-batch group commit), so pruning by the flushed
    * batch's max epoch retains exactly the not-yet-published tail; for
    * a non-monotone producer over-pruning only delays visibility to the
    * file publish, never loses a row.
    */
  def prune(upToEpoch: Long): Unit = synchronized {
    entries = entries.filter { case (_, e) => e.epoch > upToEpoch }
  }

  /** Current winners as a DataFrame in [[IngestPipeline.mutationSchema]]
    * shape, for LWW-merging under the segment tiers
    * ([[IngestPipeline.liveView]]'s `buffer` parameter). None when the
    * overlay is empty (callers skip the union). Snapshot semantics: the
    * frame is built from a local relation — later publishes don't
    * mutate a plan already handed out.
    */
  def asBuffer(spark: SparkSession): Option[DataFrame] = {
    val snap = entries
    if (snap.isEmpty) None
    else {
      val rows = snap.valuesIterator.map { e =>
        Row(e.op, e.vecId, e.id, e.idHash, e.epoch, e.deleted,
          e.centroidId, e.vec)
      }.toSeq
      Some(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        IngestPipeline.mutationSchema))
    }
  }
}

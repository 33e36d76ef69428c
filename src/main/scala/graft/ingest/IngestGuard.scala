package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side request guardrails — the ingest half of the reference's
  * limits contract (`config.h:177-182`: max_upsert_batch 10000,
  * max_request_size_bytes 100 MiB; `config.h:122-123`:
  * max_tags_per_vector 16, tag_dict_size 50000; collection dim
  * `configs/woved-default.yaml:15`). The read-side caps live in
  * [[graft.index.ServingLimits]]; together they bound every request
  * surface the reference's API validates.
  *
  * Spark-first: a batch is a DataFrame, so validation is ONE aggregate
  * pass computing every violation statistic at once (row count, max
  * tags arity, byte estimate, distinct dims), then typed rejections —
  * never a per-row driver loop, and the scan cost is paid once
  * regardless of how many limits are checked.
  */
final case class IngestLimits(
    maxUpsertBatch: Int = 10000,
    maxRequestBytes: Long = 104857600L,
    maxTagsPerVector: Int = 16,
    tagDictSize: Int = 50000,
    dim: Int = 0) // 0 = don't enforce a fixed collection dim

object IngestLimits {
  /** The reference's defaults (config.h:177-182, :122-123). */
  val reference: IngestLimits = IngestLimits()
}

sealed abstract class IngestRejected(msg: String)
  extends RuntimeException(msg)

final class UpsertBatchTooLarge(rows: Long, cap: Int)
  extends IngestRejected(
    s"upsert batch $rows rows exceeds max_upsert_batch $cap")

final class RequestTooLarge(bytes: Long, cap: Long)
  extends IngestRejected(
    s"request ~$bytes bytes exceeds max_request_size_bytes $cap")

final class TagLimitExceeded(maxTags: Int, cap: Int)
  extends IngestRejected(
    s"a vector carries $maxTags tags, above max_tags_per_vector $cap")

final class DimMismatch(dims: Seq[Int], want: Int)
  extends IngestRejected(
    s"batch carries vector dims ${dims.mkString(",")}; collection dim is $want")

object IngestGuard {

  /** Batch statistics the single validation pass computes. */
  final case class BatchStats(rows: Long, bytesEstimate: Long,
      maxTags: Int, dims: Seq[Int])

  /** Validate one upsert/delete batch against `limits`, returning its
    * stats on success and throwing the FIRST violated limit (the
    * reference rejects the whole RPC — partial application of an
    * over-limit batch would break exactly-once replay).
    *
    * Expected columns: a vector column `vecCol` (array of float/double;
    * tombstones may be null), optionally `tagsCol` (array), and
    * optionally `idCol` (a string id whose octet length counts toward
    * the wire estimate — ids are client-controlled and can dominate a
    * request, so omitting them would under-admit). The byte estimate is
    * the framed-wire shape: 8 B per vector element slot + 8 B per tag +
    * id octets + 64 B fixed per row (epoch/hashes/header) — an upper
    * bound of the reference's FlatBuffers frame, so a batch this
    * estimate admits can never exceed the true wire cap.
    *
    * NOTE on null arrays: the engine runs with ANSI off, where
    * `size(null)` is -1, not null — every size is clamped through
    * `greatest(0)` so a tombstone can never SUBTRACT from the estimate.
    */
  def validateBatch(batch: DataFrame, limits: IngestLimits = IngestLimits.reference,
      vecCol: String = "vec", tagsCol: Option[String] = None,
      idCol: Option[String] = None): BatchStats = {
    val tagsSize = tagsCol
      .map(c => greatest(coalesce(size(col(c)), lit(0)), lit(0)))
      .getOrElse(lit(0))
    val vecSize = greatest(coalesce(size(col(vecCol)), lit(0)), lit(0))
    val idBytes = idCol
      .map(c => coalesce(octet_length(col(c).cast("string")), lit(0)))
      .getOrElse(lit(0))
    val row = batch.agg(
      count(lit(1)).as("rows"),
      coalesce(sum(vecSize.cast("long") * 8L + tagsSize.cast("long") * 8L +
          idBytes.cast("long") + 64L),
        lit(0L)).as("bytes"),
      coalesce(max(tagsSize), lit(0)).as("max_tags"),
      // tombstones carry no vector: dim 0 rows are not a dim violation
      sort_array(collect_set(when(vecSize > 0, vecSize))).as("dims")
    ).head()
    val stats = BatchStats(row.getLong(0), row.getLong(1), row.getInt(2),
      row.getSeq[Int](3))
    if (stats.rows > limits.maxUpsertBatch)
      throw new UpsertBatchTooLarge(stats.rows, limits.maxUpsertBatch)
    if (stats.bytesEstimate > limits.maxRequestBytes)
      throw new RequestTooLarge(stats.bytesEstimate, limits.maxRequestBytes)
    if (stats.maxTags > limits.maxTagsPerVector)
      throw new TagLimitExceeded(stats.maxTags, limits.maxTagsPerVector)
    if (limits.dim > 0 && stats.dims.exists(_ != limits.dim))
      throw new DimMismatch(stats.dims, limits.dim)
    stats
  }
}

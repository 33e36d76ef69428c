package graft.ingest

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The engine's write path, batch form (SURVEY §2.2 W5-W8, W11-W12).
  *
  * The reference buffers {op, entry, epoch, ts} messages (`BTreeMessage`,
  * include/woved/types.h:108-113) and resolves last-writer-wins per id
  * (`msg-buf.h:133-147`, `latest-by-id.h:110-157`), masking DELETE
  * tombstones at read time and purging them at compaction.
  *
  * Spark-first shape: the mutation log is an append-only DataFrame; the
  * "latest-by-id map" is a *derived view* — LWW resolution
  * ([[graft.operators.Lww.latestBy]]) — never mutable state. At scale the
  * resolve is a narrow hash-aggregate on id (map-side partial combine)
  * plus a hash join, not a window sort.
  */
object MutationLog {

  /** Deterministic mutation log derived from `embeddings` (FIXTURES.md §B):
    *  - epoch 1000+vec_id: INSERT every row;
    *  - epoch 2000+vec_id: UPSERT rows with vec_id % 5 == 0, vector × 1.01;
    *  - epoch 3000+vec_id: DELETE rows with vec_id % 10 == 0.
    * Epochs are unique by construction. The DuckDB oracle rebuilds the same
    * log with UNION ALL, so both sides resolve identical relations.
    */
  def deterministicLog(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(
      col("vec_id"),
      concat(lit("vec-"), col("vec_id")).as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val inserts = base.select(
      lit("INSERT").as("op"), col("vec_id"), col("id"),
      (lit(1000L) + col("vec_id")).as("epoch"), col("vec"))
    val upserts = base.filter(col("vec_id") % 5 === 0).select(
      lit("UPSERT").as("op"), col("vec_id"), col("id"),
      (lit(2000L) + col("vec_id")).as("epoch"),
      transform(col("vec"), x => x * lit(1.01)).as("vec"))
    val deletes = base.filter(col("vec_id") % 10 === 0).select(
      lit("DELETE").as("op"), col("vec_id"), col("id"),
      (lit(3000L) + col("vec_id")).as("epoch"),
      lit(null).cast("array<double>").as("vec"))
    inserts.unionByName(upserts).unionByName(deletes)
  }

  /** W6/W7: resolve the latest message per id (last-writer-wins by epoch).
    * Keeps the winning row's op/epoch/vec; DELETE rows remain (as
    * tombstones) for [[live]] / compaction to mask.
    */
  def resolveLatest(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("epoch").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Same resolve as the scale shape: a narrow codegen hash-aggregate for
    * the winning epoch per id (map-side partial combine) + a shuffled-hash
    * join back — the payload is never sorted (see [[graft.operators.Lww]]).
    * Epochs are unique so this is exactly LWW.
    */
  def resolveLatestAgg(log: DataFrame): DataFrame =
    graft.operators.Lww.latestBy(
      log.select(col("id"), col("op"), col("vec_id"), col("epoch"),
        col("vec")),
      "id", "epoch")

  /** Q4/W12: live rows = latest version is not a tombstone. */
  def live(log: DataFrame): DataFrame =
    resolveLatestAgg(log).filter(col("op") =!= "DELETE")

  /** W11/W12: compaction — LWW dedupe, purge tombstones, shard by id hash
    * (reference shards by id_hash % shard_count, msg-buf.h:85-87; here
    * vec_id % 16 so the oracle can reproduce the sharding).
    * Emits per-shard segment stats (the compacted segment catalog view).
    */
  def compactStats(log: DataFrame): DataFrame =
    live(log)
      .withColumn("shard", pmod(col("vec_id"), lit(16)))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_live"),
        sum(col("epoch")).as("sum_epoch"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"))

  /** W8: point lookups — exists(id) ∧ getLatest(id) for a set of ids. */
  def pointLookup(log: DataFrame, ids: Seq[Long]): DataFrame = {
    val spark = log.sparkSession
    import spark.implicits._
    val probe = ids.toDF("vec_id")
      .select(col("vec_id"), concat(lit("vec-"), col("vec_id")).as("id"))
    val latest = resolveLatestAgg(log)
      .select(col("id"), col("op"), col("epoch"))
    probe.join(latest, Seq("id"), "left")
      .select(
        col("vec_id"),
        (col("op").isNotNull && col("op") =!= "DELETE").as("is_live"),
        coalesce(col("epoch"), lit(-1L)).as("last_epoch"))
  }

  /** A2/A3: per-op log statistics (buffer/tier observability). */
  def opStats(log: DataFrame): DataFrame =
    log.groupBy(col("op"))
      .agg(count(lit(1)).as("n"), min(col("epoch")).as("min_epoch"),
        max(col("epoch")).as("max_epoch"))
}

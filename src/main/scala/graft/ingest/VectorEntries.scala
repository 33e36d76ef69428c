package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Canonical `VectorEntry` view derived deterministically from the driver's
  * `embeddings` table (FIXTURES.md §B; reference include/woved/types.h:51-64).
  *
  * Multi-tenancy and tags are synthesized with fixed formulas so the DuckDB
  * oracle can rebuild the identical relation:
  *   tenant = 't' || (vec_id % 3); namespace_id = 'ns' || (vec_id % 2);
  *   tags = [label, 10 + vec_id % 5].
  *
  * At 100 TB this table would be written as Parquet partitioned by
  * (tenant, namespace_id) so Q2 equality filters become partition pruning.
  */
object VectorEntries {
  def fromEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      concat(lit("vec-"), col("vec_id")).as("id"),
      VectorFunctions.hashId(concat(lit("vec-"), col("vec_id"))).as("id_hash"),
      col("embedding"),
      concat(lit("t"), col("vec_id") % 3).as("tenant"),
      concat(lit("ns"), col("vec_id") % 2).as("namespace_id"),
      array(col("label"), lit(10) + (col("vec_id") % 5).cast("int"))
        .as("tags"),
      lit(false).as("deleted"))

  /** Q3: ANY-of tag overlap predicate (reference msg-buf.h:243-255). */
  def tagsAny(tags: Seq[Int]) =
    arrays_overlap(col("tags"), lit(tags.toArray))

  /** Physical multi-tenant layout (SURVEY §1.3; reference partitions the
    * collection by tenant/namespace hashes, types.h:28-31): Parquet
    * partitioned by (tenant, namespace_id), so Q2 equality filters become
    * directory-level partition pruning — at 100 TB a tenant query reads
    * zero bytes outside its own directories.
    */
  def writeTenantLayout(entries: DataFrame, dir: String): Unit =
    entries.write.partitionBy("tenant", "namespace_id")
      .mode("overwrite").parquet(dir)
}

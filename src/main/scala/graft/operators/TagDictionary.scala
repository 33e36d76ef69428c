package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S9: tag dictionary encode/decode (reference config.h:122 — ≤50k distinct
  * tags; queries arrive with string `tags_any` (types.h:72) while storage
  * holds uint32 `TagSet` (types.h:33)).
  *
  * The dictionary is tiny by contract (≤50k rows) so every encode/decode is
  * a broadcast join — no shuffle of the data side. Ids are assigned
  * deterministically: frequency descending, then name ascending (so hot
  * tags get small ids — the reference's dictionary-compression win).
  */
object TagDictionary {

  /** Build the dictionary from a document set's observed tags.
    * `tagsCol` must be array<string>. Output: (tag_name, tag_id).
    *
    * Rank assignment is a distributed range-partitioned sort followed by
    * zipWithIndex — never a single-partition global window. (tag_name is
    * unique post-aggregation, so the (n desc, tag_name asc) order is
    * total and the ids are deterministic.) The dictionary is ≤50k rows
    * by contract, but the build input — the exploded tag stream — is
    * corpus-sized, and this path keeps every stage of it parallel.
    */
  def build(docs: DataFrame, tagsCol: Column): DataFrame = {
    val spark = docs.sparkSession
    val counts = docs.select(explode(tagsCol).as("tag_name"))
      .groupBy(col("tag_name")).agg(count(lit(1)).as("n"))
    val indexed = counts.orderBy(col("n").desc, col("tag_name").asc)
      .select("tag_name").rdd
      .zipWithIndex()
      .map { case (r, i) =>
        org.apache.spark.sql.Row(r.getString(0), i + 1L)
      }
    spark.createDataFrame(indexed,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tag_name",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("tag_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Encode string tags to sorted int ids (broadcast join, re-grouped by
    * the row key). Unknown tags are dropped (reference behavior: dictionary
    * misses can't be stored in a uint32 TagSet).
    */
  def encode(docs: DataFrame, keyCol: String, tagsCol: Column,
      dict: DataFrame): DataFrame =
    docs.select(col(keyCol), explode(tagsCol).as("tag_name"))
      .join(broadcast(dict), Seq("tag_name"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("tag_id"))).as("tag_ids"))

  /** Decode int ids back to names (sorted). */
  def decode(encoded: DataFrame, keyCol: String, idsCol: Column,
      dict: DataFrame): DataFrame =
    encoded.select(col(keyCol), explode(idsCol).as("tag_id"))
      .join(broadcast(dict), Seq("tag_id"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("tag_name"))).as("tag_names"))
}

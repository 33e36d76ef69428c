package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: salted two-phase aggregation.
  *
  * A single hot key funnels its whole group through one reducer; salting
  * spreads the partial aggregation over `saltBuckets` reducers, then a
  * second (tiny) aggregation folds the partials. Works for any
  * decomposable aggregate; exposed here for count+sum, the curation
  * workhorses. The salt is a deterministic hash of the value column so
  * results are reproducible run to run.
  *
  * (Join-side skew is AQE's job — `spark.sql.adaptive.skewJoin` splits
  * oversized partitions at runtime; this operator covers the aggregation
  * case AQE doesn't.)
  */
object SkewOps {

  def saltedSumCount(df: DataFrame, keys: Seq[Column], valueCol: Column,
      saltBuckets: Int = 16): DataFrame = {
    // the salt must spread rows unconditionally — a value-derived hash
    // would collapse a hot key whose skew is one dominant value into a
    // single bucket (exactly the case this exists for). The physical
    // partition id spreads by data placement, independent of content.
    val salt = pmod(spark_partition_id(), lit(saltBuckets)).as("__salt")
    val partial = df.groupBy((keys :+ salt): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__sum"))
    partial.groupBy(keys.map(c => partial(c.toString)): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__sum")).as("sum_value"))
  }
}

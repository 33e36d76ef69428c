package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.XxHash64

import graft.functions.expr._

/** SQL registration for the engine's custom kernels — a `spark.sql` user
  * gets the same function library as the DataFrame API (SURVEY §2.5).
  */
object GraftFunctions {

  /** Register all graft_* functions on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2_sq",
      exprs => L2SqDistance(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hash_id",
      exprs => XxHash64(exprs, 0L), "scala_udf") // seed-0 (hash.h:17-20)
    reg.createOrReplaceTempFunction("graft_pq_adc",
      exprs => PqAdcSum(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => MinhashSigs(exprs(0), 32), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimhashSig(exprs(0), 28), "scala_udf")
    reg.createOrReplaceTempFunction("graft_md5_28",
      exprs => Md5Hash28(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
    // UDF-backed ids (S6/S7): registered through the UDF registry so the
    // SQL surface carries the whole §2.5 library
    spark.udf.register("graft_uuid_v7",
      org.apache.spark.sql.functions.udf(() => IdFunctions.uuidV7String())
        .asNondeterministic())
    spark.udf.register("graft_crc32c",
      org.apache.spark.sql.functions.udf(
        (bytes: Array[Byte]) => IdFunctions.crc32cLong(bytes)))
  }
}

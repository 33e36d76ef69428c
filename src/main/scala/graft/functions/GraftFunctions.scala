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
  }
}

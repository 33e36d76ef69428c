package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, XxHash64}
import org.apache.spark.sql.types.IntegerType

import graft.functions.IdFunctions
import graft.functions.expr._

/** SQL surface for the graft-native Catalyst expressions: register them
  * in the session FunctionRegistry so pure-`spark.sql` users get the
  * same codegen kernels the DataFrame API uses — `SELECT graft_dot(a.e,
  * b.e)` runs the whole-stage-codegen dot product, not a UDF.
  *
  * Two entry points, same builders:
  *  - [[GraftExtensions]] for config-time injection
  *    (`spark.sql.extensions=graft.GraftExtensions`) — the idiomatic way
  *    to enable a library engine cluster-wide;
  *  - [[GraftFunctions.register]] for a live session (tests, notebooks).
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval().asInstanceOf[Int]
    case _ => throw new IllegalArgumentException(
      s"$what must be a literal INT")
  }

  private def arity(n: Int, name: String)(
      f: PartialFunction[Seq[Expression], Expression])
      : Seq[Expression] => Expression =
    args =>
      if (f.isDefinedAt(args)) f(args)
      else throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  /** (name, builder) for every expression-backed SQL function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // S1/S2: codegen distance kernels (numeric arrays read in place)
    "graft_dot" -> arity(2, "graft_dot") {
      case Seq(a, b) => DotProduct(a, b) },
    "graft_l2sq" -> arity(2, "graft_l2sq") {
      case Seq(a, b) => L2SqDistance(a, b) },
    // S5: the reference's canonical id hash — XXH64 at seed 0 (Spark's
    // builtin xxhash64 is pinned to seed 42)
    "graft_xxhash64_0" -> { args =>
      if (args.isEmpty) throw new IllegalArgumentException(
        "graft_xxhash64_0 expects at least one argument")
      XxHash64(args, 0L) },
    // sketch kernels (dedup family)
    "graft_md5hash28" -> arity(1, "graft_md5hash28") {
      case Seq(s) => Md5Hash28(s) },
    "graft_sorted_intersect_count" ->
      arity(2, "graft_sorted_intersect_count") {
        case Seq(a, b) => SortedIntersectCount(a, b) },
    "graft_minhash_sigs" -> arity(2, "graft_minhash_sigs") {
      case Seq(arr, n) =>
        MinhashSigs(arr, litInt(n, "graft_minhash_sigs numHashes")) },
    "graft_simhash" -> arity(2, "graft_simhash") {
      case Seq(arr, n) => SimhashSig(arr, litInt(n, "graft_simhash bits")) },
    // S8: PQ ADC LUT sum
    "graft_pq_adc" -> arity(2, "graft_pq_adc") {
      case Seq(codes, lut) => PqAdcSum(codes, lut) },
    // Q9: bounded-heap top-k aggregate — the analyzer wraps the bare
    // AggregateFunction, same as builtin max/min registration
    "graft_topk" -> arity(3, "graft_topk") {
      case Seq(id, score, k) =>
        TopKAggExpr(id, score, litInt(k, "graft_topk k")) })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name)

  /** The injection descriptors [[GraftExtensions]] feeds
    * `SparkSessionExtensions.injectFunction`.
    */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    builders.map { case (name, b) => (FunctionIdentifier(name), info(name), b) }

  /** Register everything on a LIVE session: the expression-backed
    * functions above plus the UDF-backed ones (uuid_v7 is
    * nondeterministic by contract; crc32c wraps the JDK CRC32C).
    */
  def register(spark: SparkSession): Unit = {
    injections.foreach { case (id, inf, b) =>
      GraftBridge.registerFunction(spark, id, inf, b)
    }
    spark.udf.register("graft_uuid_v7",
      org.apache.spark.sql.functions.udf(() => IdFunctions.uuidV7String())
        .asNondeterministic())
    spark.udf.register("graft_crc32c",
      org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
        IdFunctions.crc32cLong(b)))
  }
}

/** `spark.sql.extensions=graft.GraftExtensions` — config-time injection
  * of the graft SQL functions into every session of the application,
  * plus the declarative-ANN planner rule
  * ([[graft.plans.AnnTopKRewrite]]: `ORDER BY graft_dot(vec, q) DESC
  * LIMIT k` over a registered centroid-partitioned store becomes an
  * IVF-probed partition-pruned scan).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    ext.injectOptimizerRule(s => graft.plans.AnnTopKRewrite(s))
  }
}

package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot distance kernels (SURVEY §2.5
  * S1/S2, reference `src/cpp/kernels/distance_*.cpp` [stubs]). The reference
  * dispatches per-ISA SIMD kernels; on Spark the equivalent is a codegen'd
  * expression that stays inside whole-stage codegen — no UDF boxing, no
  * Row materialization, tight primitive loop over `ArrayData`.
  *
  * All accumulation is IEEE double, sequential in index order. This exact
  * order is load-bearing: the DuckDB oracle computes the same sequential
  * double sum, so scores are bit-identical and hash-compare safely.
  *
  * Mismatched dimensions throw (the reference treats dim as a fixed config
  * invariant, types.h:117) — a mis-sliced PQ subvector must surface, not
  * silently corrupt rankings.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected final def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"$prettyName: vector dimensions differ ($n vs $m)")
}

/** Inner product: Σ a(i)·b(i) (reference metric `ip`, types.h:38-42). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    checkDims(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh locals: two distance expressions can share one codegen scope
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot: vector dimensions differ (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance: Σ (a(i)-b(i))² (reference metric `l2`). */
case class L2SqDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    checkDims(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "l2_sq: vector dimensions differ (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  private def toD(c: Column): Column = c.cast("array<double>")
  private def e(c: Column): Expression = GraftBridge.expression(c)

  /** Double-precision inner product (S1). */
  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(e(toD(a)), e(toD(b))))

  /** Double-precision squared L2 distance (S2). */
  def l2SqD(a: Column, b: Column): Column =
    GraftBridge.column(L2SqDistance(e(toD(a)), e(toD(b))))

  /** xxHash64 with an explicit seed over the UTF-8 bytes of a string column.
    * The reference's canonical id hash is XXH64(id, seed=0)
    * (`src/cpp/util/hash.h:17-20`); Spark's built-in `xxhash64()` function is
    * fixed at seed 42, but the underlying Catalyst expression takes any seed.
    */
  def xxhash64Seed(seed: Long, cols: Column*): Column =
    GraftBridge.column(XxHash64(cols.map(e), seed))
}

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
    if (NumericArrays.ok(left.dataType) && NumericArrays.ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric arrays (float/double/int/bigint " +
        s"elements), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected final def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"$prettyName: vector dimensions differ ($n vs $m)")

  protected final def readerFor(t: DataType): (ArrayData, Int) => Double =
    NumericArrays.reader(t)
  protected final def getterFor(t: DataType, arr: String, i: String): String =
    NumericArrays.getter(t, arr, i)
}

/** Element readers keyed by an array column's element type: a float/int
  * embedding column is read in place (one upcast per element) instead of
  * being cast to array<double> first — the cast materializes a copy of
  * every vector PER JOINED PAIR in a KNN cross join (measured 4x on a
  * 1M-vector exact scan). Upcast-then-accumulate is bit-identical to
  * cast-then-accumulate in IEEE, so oracle parity is unaffected.
  */
private[expr] object NumericArrays {
  def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }
  def reader(t: DataType): (ArrayData, Int) => Double =
    t.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => (a, i) => a.getDouble(i)
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
  def getter(t: DataType, arr: String, i: String): String =
    t.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => s"$arr.getDouble($i)"
      case FloatType   => s"(double) $arr.getFloat($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
}

/** Inner product: Σ a(i)·b(i) (reference metric `ip`, types.h:38-42). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  @transient private lazy val readL = readerFor(left.dataType)
  @transient private lazy val readR = readerFor(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    checkDims(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += readL(x, i) * readR(y, i); i += 1 }
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
         |  $acc += ${getterFor(left.dataType, x, i)} * ${getterFor(right.dataType, y, i)};
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
  @transient private lazy val readL = readerFor(left.dataType)
  @transient private lazy val readR = readerFor(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    checkDims(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = readL(x, i) - readR(y, i); s += d * d; i += 1 }
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
         |  double $d = ${getterFor(left.dataType, x, i)} - ${getterFor(right.dataType, y, i)};
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
  private def e(c: Column): Expression = GraftBridge.expression(c)

  /** Double-precision inner product (S1). Numeric arrays are read in
    * place — no cast-to-array<double> copy per evaluation.
    */
  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(e(a), e(b)))

  /** Double-precision squared L2 distance (S2). */
  def l2SqD(a: Column, b: Column): Column =
    GraftBridge.column(L2SqDistance(e(a), e(b)))

  /** xxHash64 with an explicit seed over the UTF-8 bytes of a string column.
    * The reference's canonical id hash is XXH64(id, seed=0)
    * (`src/cpp/util/hash.h:17-20`); Spark's built-in `xxhash64()` function is
    * fixed at seed 42, but the underlying Catalyst expression takes any seed.
    */
  def xxhash64Seed(seed: Long, cols: Column*): Column =
    GraftBridge.column(XxHash64(cols.map(e), seed))
}

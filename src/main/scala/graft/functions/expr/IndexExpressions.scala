package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd index kernels (SURVEY W14/B2/S8; reference
  * `src/cpp/index/centroids-manager.cpp`, `ivf-pq.cpp` [stubs],
  * `include/woved/types.h:36,62` centroid pre-assignment).
  *
  * The round-1 argmin was a crossJoin×nlist + per-key window sort — a
  * 1,024× data explosion through a full shuffle at reference nlist. These
  * expressions do the same math map-side: the centroid/codebook matrix rides
  * along as a codegen reference object (broadcast with the task closure),
  * each row computes its argmin in a tight primitive loop inside whole-stage
  * codegen, and nothing shuffles until the real aggregation.
  *
  * Distance is the expanded form `(v·v - 2·v·c) + c·c` with each dot a
  * sequential double sum — bit-identical to the DuckDB oracle's
  * `list_dot_product(e,e) - 2*list_dot_product(e,cv) + list_dot_product(cv,cv)`,
  * so assignments (including ties, broken by lowest index) hash-match.
  */
case class NearestIndex(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  // c·c per codeword, precomputed once (sequential order, same as oracle)
  private lazy val norms: Array[Double] = matrix.map { row =>
    var s = 0.0; var i = 0
    while (i < row.length) { s += row(i) * row(i); i += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (NumericArrays.ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_index requires a numeric array, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val read = NumericArrays.reader(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = read(v, i); vv += x * x; i += 1 }
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < matrix.length) {
      val row = matrix(c)
      var vc = 0.0
      i = 0
      while (i < n) { vc += read(v, i) * row(i); i += 1 }
      val d = vv - 2 * vc + norms(c)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("mat", matrix, "double[][]")
    val nrm = ctx.addReferenceObj("nrm", norms, "double[]")
    val n = ctx.freshName("n")
    val vv = ctx.freshName("vv")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val c = ctx.freshName("c")
    val row = ctx.freshName("row")
    val vc = ctx.freshName("vc")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, v => {
      val get = (idx: String) => NumericArrays.getter(child.dataType, v, idx)
      s"""
         |int $n = $v.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(i)}; $vv += $x * $x;
         |}
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $row = $mat[$c];
         |  double $vc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $vc += ${get(i)} * $row[$i]; }
         |  double $d = $vv - 2 * $vc + $nrm[$c];
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** S8 `pq_adc_score(codes, lut)`: Σ_j lut(j)(codes(j)), summed in subspace
  * order j = 0..m-1 (sequential — matches the oracle's
  * `list_sum(list(part ORDER BY j))`). `codes` is the vector's m codeword
  * *indices* (one array<int> column, 8-32 bytes scanned per row); `lut` is
  * the per-query table of partial dot products (computed once per query row
  * before the fan-out join). Reference config.h:84-94 — 96 lookups replace
  * a 768-dim dot product on the stable tier.
  */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_sum requires (array<int>, array<array<double>>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) { s += lut.getArray(j).getDouble(codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.freshName("m")
    val acc = ctx.freshName("acc")
    val j = ctx.freshName("j")
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      s"""
         |int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lut.getArray($j).getDouble($codes.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dense matrix × vector (OPQ rotation, B3): out(i) = Σ_t matrix(i)(t)·v(t),
  * each row-dot a sequential double sum. The rotation matrix rides along as
  * a codegen reference object exactly like the centroid matrix — one tight
  * primitive loop per row inside whole-stage codegen, no HOF lambda
  * interpretation (a `transform(...)` rotation measured ~40× slower).
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (NumericArrays.ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires a numeric array, got ${child.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val read = NumericArrays.reader(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](matrix.length)
    var i = 0
    while (i < matrix.length) {
      val row = matrix(i)
      var s = 0.0
      var t = 0
      while (t < n) { s += row(t) * read(v, t); t += 1 }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("mat", matrix, "double[][]")
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val i = ctx.freshName("i")
    val t = ctx.freshName("t")
    val s = ctx.freshName("s")
    val row = ctx.freshName("row")
    nullSafeCodeGen(ctx, ev, v => {
      val get = NumericArrays.getter(child.dataType, v, t)
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[$mat.length];
         |for (int $i = 0; $i < $mat.length; $i++) {
         |  double[] $row = $mat[$i];
         |  double $s = 0.0;
         |  for (int $t = 0; $t < $n; $t++) { $s += $row[$t] * $get; }
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-query PQ ADC lookup table (Q7): lut(j)(c) = Σ_t q(j·dsub+t)·cw(t),
  * sequential double accumulation per codeword — the same values as the
  * former `typedlit`-based column (dot of the query subvector with every
  * codeword). The codebook rides as a codegen REFERENCE OBJECT: at the
  * reference's m=96 × k=256 × dsub=8 (config.h:84-94) a literal codebook
  * is ~1.6 MB of plan tree — copied into every canonicalized comparison,
  * explain string, and per-stage task binary — where a reference object
  * is one broadcast-once pointer.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]],
    dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (NumericArrays.ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires a numeric array, got ${child.dataType}")
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val read = NumericArrays.reader(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val book = codebooks(j)
      val lut = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var s = 0.0
        var t = 0
        while (t < dsub) { s += read(v, j * dsub + t) * cw(t); t += 1 }
        lut(c) = s
        c += 1
      }
      out(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("books", codebooks, "double[][][]")
    val out = ctx.freshName("out")
    val lut = ctx.freshName("lut")
    val book = ctx.freshName("book")
    val cw = ctx.freshName("cw")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val t = ctx.freshName("t")
    val s = ctx.freshName("s")
    nullSafeCodeGen(ctx, ev, v => {
      val get = NumericArrays.getter(child.dataType, v, s"($j * $dsub + $t)")
      s"""
         |Object[] $out = new Object[$books.length];
         |for (int $j = 0; $j < $books.length; $j++) {
         |  double[][] $book = $books[$j];
         |  double[] $lut = new double[$book.length];
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $cw = $book[$c];
         |    double $s = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      $s += $get * $cw[$t];
         |    }
         |    $lut[$c] = $s;
         |  }
         |  $out[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IndexExpressions {
  /** Map-side argmin over a small matrix (centroids / PQ sub-codebook):
    * index of the row minimizing expanded-form L2 to `vec`, ties → lowest
    * index. Zero shuffle, whole-stage codegen.
    */
  def nearestIndex(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftBridge.column(NearestIndex(GraftBridge.expression(vec), matrix))

  /** ADC lookup-sum (S8): codes array<int> × per-query LUT array<array<double>>. */
  def pqAdcSum(codes: Column, lut: Column): Column =
    GraftBridge.column(PqAdcSum(
      GraftBridge.expression(codes), GraftBridge.expression(lut)))

  /** Dense matrix × vector (OPQ rotation): map-side, whole-stage codegen. */
  def matVec(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftBridge.column(MatVec(GraftBridge.expression(vec), matrix))

  /** Per-query PQ ADC LUT from a reference-object codebook (no typedlit). */
  def pqLut(qv: Column, codebooks: Array[Array[Array[Double]]],
      dsub: Int): Column =
    GraftBridge.column(PqLut(GraftBridge.expression(qv), codebooks, dsub))
}

package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.operators.TopK
import graft.operators.TopK.Heap

/** Native bounded top-k aggregate (SURVEY Q9): the same primitive heap as
  * [[graft.operators.TopK.TopKAgg]], but as a Catalyst
  * `TypedImperativeAggregate` — `update` reads (id, score) straight off the
  * unsafe input row, so the hot path allocates NOTHING per scored pair.
  * The typed Dataset Aggregator it replaces deserialized every row into a
  * `Scored` object through an `AppendColumns` projection (one allocation +
  * one encoder round-trip per pair — 80M of them on the 1M-corpus bench).
  *
  * Partial aggregation still applies: map tasks reduce to ≤k per group
  * before the shuffle, so shuffle volume stays O(groups × k × partitions).
  * Output: array<struct<id,score>> sorted best-first (score desc, id asc —
  * ties identical to the window strategy; TopKSpec asserts equivalence).
  */
case class TopKAggExpr(idExpr: Expression, scoreExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Heap] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  // AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4 —
  // validate here instead (callers cast explicitly in TopK.viaAggregator)
  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, double), got " +
        s"(${idExpr.dataType}, ${scoreExpr.dataType})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Heap =
    Heap(k, 0, new Array[Long](k), new Array[Double](k))

  // after binding, the children are BoundReferences over the aggregate's
  // input row — read primitives directly (no interpreted eval, no boxing
  // per scored pair). The generic eval path stays as the fallback for
  // unbound/computed children.
  @transient private lazy val idOrd = idExpr match {
    case b: BoundReference if b.dataType == LongType => b.ordinal
    case _ => -1
  }
  @transient private lazy val scoreOrd = scoreExpr match {
    case b: BoundReference if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }

  override def update(h: Heap, input: InternalRow): Heap =
    if (idOrd >= 0 && scoreOrd >= 0) {
      if (input.isNullAt(idOrd) || input.isNullAt(scoreOrd)) h
      else TopK.heapInsert(h, input.getLong(idOrd), input.getDouble(scoreOrd))
    } else {
      val id = idExpr.eval(input)
      val sc = scoreExpr.eval(input)
      if (id == null || sc == null) h
      else TopK.heapInsert(h, id.asInstanceOf[Long], sc.asInstanceOf[Double])
    }

  override def merge(a: Heap, b: Heap): Heap = TopK.heapMerge(a, b)

  override def eval(h: Heap): Any = {
    val pairs = Array.tabulate(h.n)(i => (h.ids(i), h.scores(i)))
      .sortWith { case ((i1, s1), (i2, s2)) => TopK.beatsPub(s1, i1, s2, i2) }
    new GenericArrayData(pairs.map { case (id, s) =>
      InternalRow(id, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(h: Heap): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + h.n * 16)
    buf.putInt(h.k).putInt(h.n)
    var i = 0
    while (i < h.n) { buf.putLong(h.ids(i)); i += 1 }
    i = 0
    while (i < h.n) { buf.putDouble(h.scores(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val buf = ByteBuffer.wrap(bytes)
    val kk = buf.getInt()
    val n = buf.getInt()
    val ids = new Array[Long](kk)
    val scores = new Array[Double](kk)
    var i = 0
    while (i < n) { ids(i) = buf.getLong(); i += 1 }
    i = 0
    while (i < n) { scores(i) = buf.getDouble(); i += 1 }
    Heap(kk, n, ids, scores)
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggExpr =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  override def prettyName: String = "topk_agg"
}

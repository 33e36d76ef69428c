package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Per-group bounded top-k (SURVEY Q9, reference types.h:69,118-119).
  *
  * Two strategies with identical semantics (ties broken score DESC, id ASC):
  *
  *  - [[viaWindow]]: `row_number` over a window — simple, but shuffles every
  *    scored row to the reducer that owns its query_id. Fine at test scale.
  *  - [[viaAggregator]]: a typed [[Aggregator]] with a bounded buffer.
  *    Because it is a real Catalyst aggregate, Spark runs it as
  *    partial-aggregation: each map task reduces its local rows to ≤k
  *    candidates per query *before* the shuffle, so shuffle volume is
  *    O(queries × k × partitions), independent of data size. This is the
  *    100 TB-scale path (a window sort would shuffle every scored row).
  */
object TopK {

  case class Scored(id: Long, score: Double)
  /** Bounded buffer: kept sorted ascending-by-(score, -id) so the worst
    * element is at index 0 for O(1) eviction checks; k is small (≤100,
    * reference config.h:130).
    */
  case class Buf(k: Int, items: mutable.ArrayBuffer[Scored])

  /** `(score desc, id asc)` dominance: does a beat b? */
  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {
    override def zero: Buf = Buf(k, mutable.ArrayBuffer.empty)
    override def reduce(b: Buf, x: Scored): Buf = insert(b, x)
    override def merge(a: Buf, b: Buf): Buf = {
      b.items.foreach(x => insert(a, x)); a
    }
    private def insert(b: Buf, x: Scored): Buf = {
      if (b.items.size < b.k) {
        b.items += x
        b.items.sortInPlaceWith((p, q) => beats(q, p)) // worst first
      } else if (beats(x, b.items.head)) {
        b.items(0) = x
        b.items.sortInPlaceWith((p, q) => beats(q, p))
      }
      b
    }
    override def finish(b: Buf): Seq[Scored] =
      b.items.sortWith(beats).toSeq
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Window-based top-k per `groupCol`, deterministic ties by (score desc, id asc). */
  def viaWindow(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int, ascending: Boolean = false): DataFrame = {
    val ord: Seq[Column] =
      if (ascending) Seq(col(scoreCol).asc, col(idCol).asc)
      else Seq(col(scoreCol).desc, col(idCol).asc)
    val w = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Aggregator-based top-k: map-side partial aggregation, minimal shuffle.
    * Input columns are (groupCol: long, idCol: long, scoreCol: double);
    * output has the same three columns.
    */
  def viaAggregator(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    scored
      .select(col(groupCol).cast("long"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(agg.name("topk"))
      .select(col("key").as(groupCol), explode(col("topk")).as("s"))
      .select(col(groupCol), col("s.id").as(idCol), col("s.score").as(scoreCol))
  }
}

package graft

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Wal

/** Randomized property tests for the pure (non-Spark) kernels — seeded
  * generators, 100 cases each, so failures reproduce.
  */
class PropertySpec extends AnyFunSuite {

  private def scoredList(rnd: Random): List[(Long, Double)] =
    List.fill(rnd.nextInt(80)) {
      // coarse score grid → frequent exact ties exercise the tie-break
      (rnd.nextInt(50).toLong, rnd.nextInt(10) / 2.0 - 2.0)
    }

  test("TopKAgg equals naive sort-take for random inputs incl. ties") {
    import graft.operators.TopK.{Scored, TopKAgg}
    (1 to 100).foreach { seed =>
      val rnd = new Random(seed)
      val xs = scoredList(rnd)
      val k = 1 + rnd.nextInt(20)
      val agg = new TopKAgg(k)
      val heap = xs.foldLeft(agg.zero) { case (h, (id, s)) =>
        agg.reduce(h, Scored(id, s))
      }
      val got = agg.finish(heap).map(s => (s.score, s.id))
      val expect = xs.map { case (id, s) => (s, id) }
        .sortBy { case (s, id) => (-s, id) }.take(k)
      assert(got === expect, s"seed=$seed k=$k")
    }
  }

  test("TopKAgg merge is equivalent to concatenated reduce") {
    import graft.operators.TopK.{Scored, TopKAgg}
    (1 to 100).foreach { seed =>
      val rnd = new Random(1000 + seed)
      val xs = scoredList(rnd)
      val ys = scoredList(rnd)
      val k = 1 + rnd.nextInt(10)
      val agg = new TopKAgg(k)
      def build(zs: List[(Long, Double)]) = zs.foldLeft(agg.zero) {
        case (h, (id, s)) => agg.reduce(h, Scored(id, s))
      }
      val merged = agg.finish(agg.merge(build(xs), build(ys)))
      val whole = agg.finish(build(xs ++ ys))
      assert(merged === whole, s"seed=$seed k=$k")
    }
  }

  test("TopKAggExpr binary buffer roundtrips and matches TopKAgg results") {
    import graft.functions.expr.TopKAggExpr
    import graft.operators.TopK.{Scored, TopKAgg}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    (1 to 100).foreach { seed =>
      val rnd = new Random(seed)
      val xs = scoredList(rnd)
      val k = 1 + rnd.nextInt(20)
      val expr = TopKAggExpr(
        BoundReference(0, LongType, nullable = false),
        BoundReference(1, DoubleType, nullable = false), k)
      val h = xs.foldLeft(expr.createAggregationBuffer()) { case (acc, (id, s)) =>
        expr.update(acc,
          org.apache.spark.sql.catalyst.InternalRow(id, s))
      }
      // serialize → deserialize → merge with empty ≡ identity
      val rt = expr.merge(expr.createAggregationBuffer(),
        expr.deserialize(expr.serialize(h)))
      val got = expr.eval(rt)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.toSeq
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        .map(r => (r.getLong(0), r.getDouble(1)))
      // same answer as the typed Aggregator over the same input
      val agg = new TopKAgg(k)
      val expect = agg.finish(xs.foldLeft(agg.zero) { case (acc, (id, s)) =>
        agg.reduce(acc, Scored(id, s))
      }).map(s => (s.id, s.score))
      assert(got === expect, s"seed=$seed k=$k")
    }
  }

  test("WAL roundtrip preserves random payloads and epochs") {
    (1 to 30).foreach { seed =>
      val rnd = new Random(2000 + seed)
      val recs = List.fill(rnd.nextInt(40)) {
        val payload = rnd.alphanumeric.take(rnd.nextInt(200)).mkString +
          "π≤≥é" // non-ASCII tail: UTF-8 length ≠ char count
        (rnd.nextLong().abs, payload)
      }
      val p = Files.createTempDirectory("graft-prop-wal-")
        .resolve("w.log").toString
      Wal.append(p, recs)
      assert(Wal.replay(p) === recs, s"seed=$seed")
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r15 optimization round's two parallelism primitives: value
  * invariance and the scale gates. Every hot path that adopted them
  * (exactBatch, adcScores, searchAllDF, the pair-verify joins, the text
  * explode passes) relies on exactly these two properties.
  */
class ParallelismSpec extends SparkSpec {

  test("widen repartitions a one-split input to default parallelism") {
    val df = emb // one small parquet file → 1 scan partition
    val wide = Parallelism.widen(df)
    assert(wide.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("widen preserves values exactly (row multiset unchanged)") {
    val df = emb.select(col("vec_id"), col("label"))
    val a = df.collect().map(_.toSeq).sortBy(_.toString)
    val b = Parallelism.widen(df).collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("widen is a no-op on inputs wider than one scan split") {
    // force the smallest legal split so the tiny fixture counts as "wide":
    // the no-op branch is the PRODUCTION path and must stay reachable
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "1")
    try {
      val df = emb
      assert(Parallelism.widen(df) eq df)
    } finally spark.conf.set(key, prev)
  }

  test("parRequests preserves request order and values") {
    val reqs = (0 until 100).toSeq
    val out = Parallelism.parRequests(reqs)(i => i * i)
    assert(out === reqs.map(i => i * i))
  }

  test("parRequests runs concurrent Spark jobs correctly") {
    // each request is an independent job — the concurrent loop must
    // return exactly the sequential loop's answers
    val reqs = (1 to 8).toSeq
    val out = Parallelism.parRequests(reqs) { i =>
      spark.range(i * 100L).count()
    }
    assert(out === reqs.map(i => i * 100L))
  }

  test("parRequests propagates a request failure") {
    intercept[RuntimeException] {
      Parallelism.parRequests(Seq(1, 2, 3)) { i =>
        if (i == 2) throw new RuntimeException("boom") else i
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Filtered batch top-k similarity search — the reference's entire query
  * surface (`QueryRequest`, include/woved/types.h:67-75; operators Q1-Q4,
  * Q9, Q12 in SURVEY §2.3).
  *
  * Shape: the query set (≤100 rows, reference config.h:180) is broadcast;
  * the vector table streams through a whole-stage-codegen'd score + filter;
  * per-query top-k reduces map-side (TopK.viaAggregator) so the shuffle
  * carries only O(queries × k) rows per partition. No global sort, no
  * all-rows shuffle — the plan scales linearly with the scanned fraction.
  */
object Knn {

  /** Score column for a metric ∈ {ip, l2, cosine}.
    * For l2 the score is *ascending* (smaller = better).
    */
  def score(metric: String, q: Column, v: Column): Column = metric match {
    case "ip" => dotD(q, v)
    case "l2" => l2SqD(q, v)
    // expanded |a|²-2ab+|b|² form: less accurate, but expressible purely via
    // dot products so the SQL oracle reproduces it bit-for-bit
    case "l2x" => l2SqExpanded(q, v)
    case "cosine" => cosineD(q, v)
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  def isAscending(metric: String): Boolean = metric == "l2" || metric == "l2x"

  /** Exact batch KNN: every query in `queries` (cols: query_id, qv) against
    * `data` (cols: idCol, vecCol), optional pre-filter, deterministic ties.
    * Output: (query_id, idCol, score).
    */
  def exactBatch(queries: DataFrame, data: DataFrame, metric: String, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      filter: Column = lit(true), useAggregator: Boolean = true): DataFrame = {
    val scored = data
      .filter(filter)
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col(idCol),
        score(metric, col("qv"), col(vecCol)).as("score"))
    topK(scored, metric, k, idCol, useAggregator)
  }

  /** Exact batch KNN, bulk-kernel variant: same results as [[exactBatch]]
    * (B5 ground-truth generation, recall sweeps, batch scoring jobs), a
    * different execution shape. [[exactBatch]] is the composable
    * declarative plan — broadcast nested-loop × codegen score × heap
    * aggregate — but it pays per-(row, query) expression-eval overhead:
    * each joined pair re-reads the row vector out of ArrayData and runs
    * one latency-bound accumulator chain. This kernel scans each
    * partition once, buffers each row vector once, and scores FOUR
    * queries per pass with interleaved accumulator chains (the query
    * block stays L1-resident), feeding per-query bounded top-k heaps;
    * only nq×k partial rows per partition leave the scan, merged by the
    * same [[TopK]] contract.
    *
    * Per (query, row) the arithmetic is bit-identical to the codegen
    * kernels (sequential double accumulation in index order; cosine's
    * query norm hoisted — loop-invariant, same chains), and ties break
    * (score best, id ascending) exactly as [[topK]] does, so results
    * hash-match [[exactBatch]] and the DuckDB oracle (KnnSpec pins the
    * equivalence). Null vectors are skipped, as null scores are by the
    * aggregate path.
    */
  def exactBatchBulk(queries: DataFrame, data: DataFrame, metric: String,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      filter: Column = lit(true)): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val asc = isAscending(metric)
    // queries driver-side (≤100 by the reference batch cap, config.h:180)
    val qRows = queries
      .select(col("query_id").cast("long"),
        col("qv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qIds = qRows.map(_._1)
    val qVecs = qRows.map(_._2)
    // per-query self-norms, hoisted (sequential order — the same chain
    // the fused expression would run per pair)
    val qNorm = qVecs.map { q =>
      var s = 0.0; var i = 0
      while (i < q.length) { s += q(i) * q(i); i += 1 }
      s
    }
    val m = metric
    val isFloat = data.schema(vecCol).dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true) ||
      data.schema(vecCol).dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false)
    val src = data.filter(filter)
      .select(col(idCol).cast("long"),
        col(vecCol).cast(if (isFloat) "array<float>" else "array<double>"))
      .toDF("_1", "_2") // tuple encoders resolve fields by name
    def partials[T](rowVec: T => Array[Double], rowId: T => Long)(
        it: Iterator[T]): Iterator[(Long, Long, Double)] = {
      val nq = qVecs.length
      if (nq == 0) return Iterator.empty
      val heaps = Array.fill(nq)(new BoundedTopKHeap(k, asc))
      it.foreach { row =>
        val v = rowVec(row)
        if (v != null) {
          val id = rowId(row)
          val d = v.length
          // self-norm once per row (l2x/cosine need it; ip/l2 do not)
          var vv = 0.0
          if (m == "l2x" || m == "cosine") {
            var i = 0
            while (i < d) { vv += v(i) * v(i); i += 1 }
          }
          var qi = 0
          val lim4 = nq - 3
          while (qi < lim4) {
            val q0 = qVecs(qi); val q1 = qVecs(qi + 1)
            val q2 = qVecs(qi + 2); val q3 = qVecs(qi + 3)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
            var i = 0
            if (m == "l2") {
              while (i < d) {
                val x = v(i)
                val a0 = q0(i) - x; s0 += a0 * a0
                val a1 = q1(i) - x; s1 += a1 * a1
                val a2 = q2(i) - x; s2 += a2 * a2
                val a3 = q3(i) - x; s3 += a3 * a3
                i += 1
              }
            } else {
              while (i < d) {
                val x = v(i)
                s0 += q0(i) * x; s1 += q1(i) * x
                s2 += q2(i) * x; s3 += q3(i) * x
                i += 1
              }
            }
            heaps(qi).insert(finishScore(m, s0, qNorm(qi), vv), id)
            heaps(qi + 1).insert(finishScore(m, s1, qNorm(qi + 1), vv), id)
            heaps(qi + 2).insert(finishScore(m, s2, qNorm(qi + 2), vv), id)
            heaps(qi + 3).insert(finishScore(m, s3, qNorm(qi + 3), vv), id)
            qi += 4
          }
          while (qi < nq) {
            val q = qVecs(qi)
            var s = 0.0
            var i = 0
            if (m == "l2") {
              while (i < d) { val a = q(i) - v(i); s += a * a; i += 1 }
            } else {
              while (i < d) { s += q(i) * v(i); i += 1 }
            }
            heaps(qi).insert(finishScore(m, s, qNorm(qi), vv), id)
            qi += 1
          }
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.result().iterator.map { case (id, s) => (qIds(qi), id, s) }
      }
    }
    val partDs: org.apache.spark.sql.Dataset[(Long, Long, Double)] =
      if (isFloat)
        src.as[(Long, Array[Float])].mapPartitions(
          partials[(Long, Array[Float])](
            r => {
              val f = r._2
              if (f == null) null
              else {
                val o = new Array[Double](f.length)
                var i = 0
                while (i < f.length) { o(i) = f(i).toDouble; i += 1 }
                o
              }
            }, _._1))
      else
        src.as[(Long, Array[Double])].mapPartitions(
          partials[(Long, Array[Double])](_._2, _._1))
    // nq×k rows per partition; final merge through the SAME top-k
    // contract as the declarative path
    topK(partDs.toDF("query_id", idCol, "score"), metric, k, idCol)
  }

  /** Metric epilogue shared by [[exactBatchBulk]]'s interleaved and tail
    * loops: ip/l2 pass through; l2x expands; cosine normalizes with the
    * hoisted query norm — IEEE op order matches the column kernels
    * (dot / (sqrt(qq) · sqrt(vv))).
    */
  private def finishScore(metric: String, s: Double, qq: Double,
      vv: Double): Double = metric match {
    case "ip" | "l2" => s
    case "l2x" => qq - 2 * s + vv
    case "cosine" => s / (math.sqrt(qq) * math.sqrt(vv))
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  // the bulk kernel's per-query heaps use THE shared rank kernel
  // ([[TopK.Bounded]]) — one definition of the (score best, id asc) tie
  // contract across the serving scans, local tiers, and this path
  private[operators] type BoundedTopKHeap = TopK.Bounded

  /** Shared per-query top-k dispatch: bounded-heap aggregator for both
    * directions (ascending metrics ride through negation — exact in IEEE).
    */
  def topK(scored: DataFrame, metric: String, k: Int, idCol: String,
      useAggregator: Boolean = true): DataFrame = {
    val asc = isAscending(metric)
    val picked =
      if (useAggregator && !asc)
        TopK.viaAggregator(scored, "query_id", idCol, "score", k)
      else if (useAggregator && asc)
        // aggregator keeps max; negate scores for ascending metrics
        TopK.viaAggregator(
            scored.withColumn("score", -col("score")), "query_id", idCol,
            "score", k)
          .withColumn("score", -col("score"))
      else TopK.viaWindow(scored, "query_id", idCol, "score", k, asc)
    picked.select(col("query_id"), col(idCol), col("score"))
  }

  /** Deterministic default query workload: embeddings rows with
    * vec_id % 25 == 0 (FIXTURES.md `queries` fixture — 20 queries at sf0.01).
    */
  def defaultQueries(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** Deterministic 25%-sample restriction (reference `sample_p`,
    * config.h:78/types.h:74) — Knuth-multiplicative bucket on vec_id so the
    * oracle can replicate it exactly: (vec_id * 2654435761) % 100 < 25.
    */
  def sampleFilter(p: Int = 25): Column =
    pmod(col("vec_id") * lit(2654435761L), lit(100)) < p
}

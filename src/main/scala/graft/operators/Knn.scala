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

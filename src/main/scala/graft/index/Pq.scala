package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.TopK

/** Product quantization + two-phase search (SURVEY B3/Q7/Q8; reference
  * config.h:84-94 — PQ m=96 × 8 bits over dim 768, rerank_factor 4).
  *
  * The driver's embeddings are dim 64, so the engine parameterizes m; the
  * oracle-checked configuration is m=8 subspaces × 8 dims with a
  * deterministic codebook (subvectors of every 50th row — k=10 codewords at
  * sf0.01). Production codebooks come from per-subspace MLlib KMeans
  * ([[Ivf.trainKMeans]] applied per slice) — recall-tested, not hash-matched.
  *
  * Scale shape: codes are 8-32 bytes vs 256-3072 raw — the phase-1 scan
  * reads only the codes column (column pruning) and the broadcast codebook;
  * phase 2 re-scores `rerank × k` candidates per query by joining the
  * candidate ids back to the raw vectors (a broadcast-able join: candidates
  * are tiny). ADC look-up tables per query are what the sum-over-subspaces
  * expression computes inline.
  */
object Pq {

  /** Deterministic per-subspace codebook: for subspace j (0-based), the
    * codewords are `slice(embedding, j*dsub+1, dsub)` of rows with
    * vec_id % every == 0. Output: (j, code_id=vec_id, cw: array<double>).
    */
  def deterministicCodebook(embeddings: DataFrame, m: Int, dsub: Int,
      every: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val subspaces = (0 until m).toDF("j")
    embeddings.filter(col("vec_id") % every === 0)
      .crossJoin(subspaces)
      .select(col("j"), col("vec_id").as("code_id"),
        slice(col("embedding").cast("array<double>"),
          col("j") * dsub + 1, lit(dsub)).as("cw"))
  }

  /** B3 encode: per (vector, subspace) pick the nearest codeword
    * (expanded-form L2, ties code_id asc — oracle-identical).
    * Output: (vec_id, j, code_id).
    */
  def encode(data: DataFrame, codebook: DataFrame, m: Int, dsub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val subspaces = (0 until m).toDF("j")
    val sliced = data.crossJoin(subspaces)
      .select(col(idCol), col("j"),
        slice(col(vecCol).cast("array<double>"),
          col("j") * dsub + 1, lit(dsub)).as("sv"))
    val w = Window.partitionBy(col(idCol), col("j"))
      .orderBy(col("__d").asc, col("code_id").asc)
    sliced.join(broadcast(codebook), Seq("j"))
      .withColumn("__d", l2SqExpanded(col("sv"), col("cw")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("j"), col("code_id"))
  }

  /** Q7 ADC phase 1: approximate inner-product score =
    * Σ_j dot(q_j, codeword(code_j)). Summed in subspace order j=0..m-1 so
    * the oracle's ordered sum matches bit-for-bit.
    */
  def adcScores(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      m: Int, dsub: Int, idCol: String = "vec_id"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val subspaces = (0 until m).toDF("j")
    // per-query LUT: dot(q_j, cw) for every (j, code_id)
    val lut = queries.crossJoin(subspaces)
      .select(col("query_id"), col("qv"), col("j"))
      .join(broadcast(codebook), Seq("j"))
      .select(col("query_id"), col("j"), col("code_id"),
        dotD(slice(col("qv").cast("array<double>"),
          col("j") * dsub + 1, lit(dsub)), col("cw")).as("part"))
    // join codes to LUT and sum parts in subspace order
    codes.join(broadcast(lut), Seq("j", "code_id"))
      .groupBy(col("query_id"), col(idCol))
      // deterministic ordered sum: sort parts by j then fold left-to-right
      .agg(aggregate(
        array_sort(collect_list(struct(col("j"), col("part")))),
        lit(0.0), (acc, x) => acc + x("part")).as("approx_score"))
  }

  /** Q8 two-phase: phase-1 ADC top-(rerank×k) candidates → exact re-score
    * from raw vectors → final top-k. Output (query_id, idCol, score).
    */
  def twoPhaseSearch(data: DataFrame, codes: DataFrame, codebook: DataFrame,
      queries: DataFrame, m: Int, dsub: Int, k: Int, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val approx = adcScores(codes, codebook, queries, m, dsub, idCol)
    val candidates = TopK.viaWindow(approx, "query_id", idCol,
      "approx_score", rerank * k)
    val exact = candidates
      .join(queries, Seq("query_id"))
      .join(data.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("query_id"), col(idCol),
        dotD(col("qv"), col(vecCol)).as("score"))
    TopK.viaWindow(exact, "query_id", idCol, "score", k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage-compression step a
  * 100 TB embedding corpus takes before anything else (4× smaller than
  * float32, 8× smaller than the double staging form; ADC-style scoring
  * and SIMD scans work directly on the codes). Complements PQ
  * ([[graft.index.Pq]]): PQ is lossy sub-vector clustering for search,
  * int8 is near-lossless per-vector scaling for storage/interchange.
  *
  * Symmetric per-vector scheme (the common default): scale = max|x|/127,
  * code_i = floor(x_i/scale + 0.5) ∈ [-127, 127] (half-up — chosen over
  * round() because floor(x + 0.5) is bit-identical across SQL engines,
  * while round() half-even/half-away conventions differ), zero vectors
  * get scale 0 / all-zero codes. Max dequantization error is scale/2 by
  * construction — asserted in the spec, and the gated output carries the
  * per-vector measured max error so the oracle proves the arithmetic,
  * not just the shape.
  *
  * Plan shape: one narrow projection chain of codegen HOFs over
  * projected attributes (the interpreted-HOF no-CSE rule: the double
  * array and the scale are materialized as attributes BEFORE any lambda
  * references them) — map-side only, no shuffle, scales linearly.
  */
object Quantize {

  /** (vec_id, scale, codes array<int>) — the stored form. */
  def int8Codes(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = col(vecCol).cast("array<double>")
    emb.select(col(idCol), e.as("__e"))
      .select(col(idCol), col("__e"),
        (aggregate(col("__e"), lit(0.0),
          (a: Column, x: Column) => greatest(a, abs(x))) / 127.0d)
          .as("scale"))
      .select(col(idCol), col("scale"),
        when(col("scale") === 0.0d,
          transform(col("__e"), _ => lit(0)))
          .otherwise(transform(col("__e"),
            x => floor(x / col("scale") + 0.5d).cast("int")))
          .as("codes"))
  }

  /** Int8-scored two-phase KNN — the scan you actually run over an
    * int8-compressed corpus at 100 TB: phase 1 scores candidates
    * directly on the codes (integer dot — the codegen [[graft.functions.
    * VectorFunctions.dotD]] kernel reads int arrays in place; products
    * ≤ 127² · dim stay exact in double accumulation — times the two
    * scale factors), phase 2 reranks the rerank×k survivors against the
    * raw vectors, exactly the PQ two-phase shape
    * ([[graft.index.Pq.twoPhaseSearch]]) with a 4×-smaller scan instead
    * of a codebook. Phase-1 arithmetic is fully exact (integer dot,
    * two double multiplies), so the DuckDB oracle replays the candidate
    * sets bit-for-bit — unlike real SIMD-int8 engines there is no
    * approximation ambiguity to paper over.
    */
  def int8TwoPhase(data: DataFrame, queries: DataFrame, k: Int,
      rerank: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    val vc = int8Codes(data, idCol, vecCol)
    val qc = int8Codes(
        queries.select(col("query_id").as(idCol), col("qv").as(vecCol)),
        idCol, vecCol)
      .select(col(idCol).as("query_id"), col("scale").as("__qs"),
        col("codes").as("__qc"))
    val approx = vc.crossJoin(broadcast(qc))
      .select(col("query_id"), col(idCol),
        (dotD(col("__qc"), col("codes")) * (col("__qs") * col("scale")))
          .as("approx_score"))
    val candidates = TopK.viaAggregator(approx, "query_id", idCol,
        "approx_score", rerank * k)
      .select(col("query_id"), col(idCol))
    val exact = broadcast(candidates)
      .join(queries, Seq("query_id"))
      .join(data.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("query_id"), col(idCol),
        dotD(col("qv"), col(vecCol)).as("score"))
    TopK.viaAggregator(exact, "query_id", idCol, "score", k)
  }

  /** Gated stats: per-vector scale, exact integer code sum, and the
    * measured max |x − code·scale| (≤ scale/2 by construction). Every
    * value is IEEE-deterministic (integer sums exact; max is
    * order-independent), so a SQL oracle replays it bit-for-bit.
    */
  def int8Stats(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = col(vecCol).cast("array<double>")
    emb.select(col(idCol), e.as("__e"))
      .select(col(idCol), col("__e"),
        (aggregate(col("__e"), lit(0.0),
          (a: Column, x: Column) => greatest(a, abs(x))) / 127.0d)
          .as("__s"))
      .select(col(idCol), col("__e"), col("__s"),
        when(col("__s") === 0.0d, transform(col("__e"), _ => lit(0)))
          .otherwise(transform(col("__e"),
            x => floor(x / col("__s") + 0.5d).cast("int")))
          .as("__c"))
      .select(col(idCol),
        col("__s").as("scale"),
        aggregate(col("__c"), lit(0L),
          (a: Column, c: Column) => a + c.cast("long")).as("sum_code"),
        aggregate(
          zip_with(col("__e"), col("__c"),
            (x: Column, c: Column) => abs(x - c.cast("double") * col("__s"))),
          lit(0.0), (a: Column, d: Column) => greatest(a, d))
          .as("max_err"))
  }
}

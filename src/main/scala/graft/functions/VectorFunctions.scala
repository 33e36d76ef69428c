package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.expr.VectorExpressions

/** Column-level vector function library (SURVEY §2.5 S1-S4).
  *
  * Everything is double-precision with sequential index-order accumulation so
  * that results are bit-identical to the DuckDB oracle's `list_dot_product`
  * over `DOUBLE[]` — no rounding needed for hash compares.
  *
  * Reference semantics: `include/woved/types.h:38-42` (metrics ip/l2/cosine;
  * "Cosine via L2-norm at ingest"), `schemas/wal-record.fbs:40-41`.
  */
object VectorFunctions {

  /** S1: inner product (codegen'd Catalyst expression). */
  def dotD(a: Column, b: Column): Column = VectorExpressions.dotD(a, b)

  /** S2: squared L2 distance (codegen'd Catalyst expression). */
  def l2SqD(a: Column, b: Column): Column = VectorExpressions.l2SqD(a, b)

  /** Squared L2 in the algebraically expanded form |a|² - 2a·b + |b|².
    * Less accurate than [[l2SqD]] under cancellation, but expressible in any
    * SQL dialect purely via dot products — the deterministic-oracle IVF/PQ
    * queries use this form on BOTH sides so rankings match bit-for-bit.
    */
  def l2SqExpanded(a: Column, b: Column): Column =
    dotD(a, a) - lit(2.0) * dotD(a, b) + dotD(b, b)

  /** S3: cosine similarity, computed as dot/(|a||b|) in a fixed op order. */
  def cosineD(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotD(a, a))

  /** S4: L2-normalize a vector (ingest-time normalization for cosine,
    * reference types.h:39 / wal-record.fbs:40-41). Stays array<double>.
    */
  def l2Normalize(a: Column): Column = {
    val ad = a.cast("array<double>")
    transform(ad, x => x / sqrt(aggregate(ad, lit(0.0), (acc, v) => acc + v * v)))
  }

  /** S5: canonical id hash = XXH64(utf8(s), seed 0)
    * (reference `src/cpp/util/hash.h:17-20`; Spark's `xxhash64()` builtin is
    * seed 42, hence the explicit-seed wrapper).
    */
  def hashId(c: Column): Column = VectorExpressions.xxhash64Seed(0L, c)

  /** Subvector slice for PQ subspaces: 1-based `start`, `len` elements. */
  def subvector(a: Column, start: Int, len: Int): Column = slice(a, start, len)
}

package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** OPQ — optimized product quantization (SURVEY B3 gap; reference
  * config.h:88 `use_opq: true` over PQ m=96×8 bits).
  *
  * Parametric OPQ per Ge et al., "Optimized Product Quantization" (CVPR
  * 2013): learn an orthonormal rotation R so that the rotated space
  * distributes variance evenly across the m PQ subspaces, then run plain
  * PQ in the rotated space. The parametric variant is PCA + eigenvalue
  * allocation — greedily assign principal components to subspaces
  * balancing the per-subspace variance product — which needs one
  * covariance pass and no alternating optimization.
  *
  * Scale shape: covariance is one `RowMatrix.computeCovariance` pass
  * (map-side Gram accumulation, d×d driver result — d ≤ a few thousand);
  * the eigendecomposition is driver-local (d×d); the rotation itself is a
  * broadcast matrix literal applied map-side (d dot products per row, no
  * shuffle, no UDF). Inner products are invariant under R, so phase-2
  * exact rerank runs on RAW vectors — only codes live in rotated space.
  */
object Opq {

  /** Orthonormal rotation: `matrix(i)` is the output dimension i's basis
    * vector (a principal component), so rotate(v) = matrix · v.
    */
  final case class Rotation(matrix: Array[Array[Double]]) {
    def d: Int = matrix.length
  }

  /** Train the parametric OPQ rotation: PCA of the data covariance +
    * eigenvalue allocation into m subspaces of dsub dims each.
    */
  def trainRotation(embeddings: DataFrame, m: Int, dsub: Int,
      vecCol: String = "embedding"): Rotation = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val d = m * dsub
    val rdd = embeddings.select(col(vecCol).cast("array<double>")).rdd
      .map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val cov = new RowMatrix(rdd).computeCovariance()
    val covB = new breeze.linalg.DenseMatrix(d, d, cov.toArray)
    val es = breeze.linalg.eigSym(covB)
    // breeze returns eigenvalues ascending; take descending order
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    // eigenvalue allocation: place each component (largest first) into the
    // subspace with the smallest variance product so far (log-sum to avoid
    // underflow), among subspaces with remaining capacity
    val logProd = Array.fill(m)(0.0)
    val fill = Array.fill(m)(0)
    val buckets = Array.fill(m)(List.empty[Int])
    order.foreach { comp =>
      val j = (0 until m).filter(fill(_) < dsub).minBy(logProd(_))
      buckets(j) ::= comp
      fill(j) += 1
      logProd(j) += math.log(math.max(es.eigenvalues(comp), 1e-12))
    }
    val outOrder = buckets.flatMap(_.reverse)
    val rot = outOrder.map { comp =>
      Array.tabulate(d)(row => es.eigenvectors(row, comp))
    }
    Rotation(rot)
  }

  /** Map-side rotation column: rotate(v) = R·v, one codegen'd mat-vec per
    * row against the reference-object matrix (HOF lambdas are interpreted
    * and the 64×64 literal bloats every plan — measured 26 s → ~3 s for
    * the full OPQ query when this moved to a custom expression).
    */
  def rotate(rot: Rotation, vec: Column): Column =
    graft.functions.expr.IndexExpressions.matVec(vec, rot.matrix)

  /** B3 + OPQ: train rotation, then per-subspace KMeans codebooks in the
    * rotated space.
    */
  def trainCodebookOpq(embeddings: DataFrame, m: Int, dsub: Int, k: Int,
      seed: Long = 42L, vecCol: String = "embedding",
      maxIter: Int = 10): (Rotation, Pq.Codebook) = {
    val rot = trainRotation(embeddings, m, dsub, vecCol)
    // materialize the rotation once — the m concurrent KMeans fits iterate
    // over this input many times and must not re-rotate per pass
    val rotated = embeddings.withColumn("__rv", rotate(rot, col(vecCol)))
      .cache()
    try {
      rotated.count()
      val cb = Pq.trainCodebook(rotated, m, dsub, k, seed, vecCol = "__rv",
        maxIter = maxIter)
      (rot, cb)
    } finally rotated.unpersist(blocking = false)
  }

  /** Encode raw vectors against an OPQ codebook (rotation happens inline,
    * still one map-side projection).
    */
  def encode(data: DataFrame, rot: Rotation, cb: Pq.Codebook,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Pq.encode(data.withColumn("__rv", rotate(rot, col(vecCol))), cb,
      idCol, vecCol = "__rv")

  /** Q7/Q8 with OPQ: phase-1 ADC in rotated space (rotated query LUT),
    * phase-2 exact rerank on RAW vectors — dot products are invariant
    * under the orthonormal R, so the final scores are the plain exact
    * scores and the rotation never touches the rerank path.
    */
  def twoPhaseSearch(data: DataFrame, codes: DataFrame, rot: Rotation,
      cb: Pq.Codebook, queries: DataFrame, k: Int, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.operators.TopK
    val qRot = queries.select(col("query_id"),
      rotate(rot, col("qv")).as("qv"))
    val approx = Pq.adcScores(codes, cb, qRot, idCol)
    val candidates =
      TopK.viaAggregator(approx, "query_id", idCol, "approx_score",
        rerank * k)
        .select(col("query_id"), col(idCol))
    val exact = broadcast(candidates)
      .join(queries, Seq("query_id"))
      .join(data.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("query_id"), col(idCol),
        dotD(col("qv"), col(vecCol)).as("score"))
    TopK.viaAggregator(exact, "query_id", idCol, "score", k)
  }
}

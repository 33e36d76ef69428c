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
    val (eigenvalues, eigenvectors, d) = pca(embeddings, m * dsub, vecCol)
    // eigenvalue allocation: place each component (largest first) into the
    // subspace with the smallest variance product so far (log-sum to avoid
    // underflow), among subspaces with remaining capacity
    val order = (0 until d).sortBy(i => -eigenvalues(i))
    val logProd = Array.fill(m)(0.0)
    val fill = Array.fill(m)(0)
    val buckets = Array.fill(m)(List.empty[Int])
    order.foreach { comp =>
      val j = (0 until m).filter(fill(_) < dsub).minBy(logProd(_))
      buckets(j) ::= comp
      fill(j) += 1
      logProd(j) += math.log(math.max(eigenvalues(comp), 1e-12))
    }
    val outOrder = buckets.flatMap(_.reverse)
    Rotation(outOrder.map(comp =>
      Array.tabulate(d)(row => eigenvectors(row)(comp))).toArray)
  }

  /** PCA rotation in natural descending-eigenvalue order (consecutive
    * slices per subspace, no allocation) — the degenerate OPQ variant used
    * to isolate whether eigenvalue allocation helps on a given corpus.
    */
  def trainRotationNatural(embeddings: DataFrame, m: Int, dsub: Int,
      vecCol: String = "embedding"): Rotation = {
    val (eigenvalues, eigenvectors, d) = pca(embeddings, m * dsub, vecCol)
    val order = (0 until d).sortBy(i => -eigenvalues(i))
    Rotation(order.map(comp =>
      Array.tabulate(d)(row => eigenvectors(row)(comp))).toArray)
  }

  /** One covariance pass + driver-local eigendecomposition; returns
    * (eigenvalues, eigenvectors(row)(comp), d).
    */
  private def pca(embeddings: DataFrame, d: Int,
      vecCol: String): (Array[Double], Array[Array[Double]], Int) = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rdd = embeddings.select(col(vecCol).cast("array<double>")).rdd
      .map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val cov = new RowMatrix(rdd).computeCovariance()
    val covB = new breeze.linalg.DenseMatrix(d, d, cov.toArray)
    val es = breeze.linalg.eigSym(covB)
    val evals = Array.tabulate(d)(es.eigenvalues(_))
    val evecs = Array.tabulate(d)(r => Array.tabulate(d)(c => es.eigenvectors(r, c)))
    (evals, evecs, d)
  }

  /** Fixed, non-data-derived orthonormal rotation: a signed permutation —
    * rotated(i) = s_i · v(p_i) with p_i = (17·i + 3) mod d and s_i = ±1 by
    * parity of i. 17 is odd so p is a bijection for any even d, and a
    * signed permutation matrix is orthonormal. Exists so the OPQ
    * *pipeline* (rotate → encode → ADC → rerank-on-raw invariance) can be
    * replayed bit-for-bit by the DuckDB oracle (`knn_pq_opq`); the
    * data-derived trainers keep their ScalaTest/bench recall gates.
    */
  def fixedRotation(d: Int): Rotation =
    Rotation(Array.tabulate(d) { i =>
      val row = new Array[Double](d)
      row((17 * i + 3) % d) = if (i % 2 == 0) 1.0 else -1.0
      row
    })

  /** Non-parametric OPQ (Ge et al. §3.1 / ck-means): alternate
    *  (1) Procrustes rotation update — R = U·Vᵀ from the SVD of the
    *      reconstruction-cross-covariance M = Σ y·xᵀ (the orthonormal R
    *      minimizing ‖R·x − y‖² for the current codes), and
    *  (2) codebook retraining in the new rotated space —
    * starting from R = identity, whose codebook IS plain PQ. Every iterate
    * (including the identity start) is distortion-scored and the best
    * (R, codebook) pair wins, so the result is never worse than plain PQ
    * on the training corpus — the guarantee the parametric PCA variant
    * lacks (measured: PCA rotation LOSES to identity on the clustered
    * synthetic corpus, 0.804 vs 0.829 recall at sf0.1).
    *
    * Scale shape: each iteration is one map-side treeAggregate pass
    * (per row: m codegen-free argmin encodes + a d×d outer-product
    * accumulate — d ≤ a few thousand) plus m driver-coordinated KMeans
    * fits; train on a bounded sample at 100 TB like every codebook step.
    */
  def trainCodebookOpqIterative(embeddings: DataFrame, m: Int, dsub: Int,
      k: Int, iters: Int = 3, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id",
      maxIter: Int = 10,
      valQueries: Option[DataFrame] = None): (Rotation, Pq.Codebook) = {
    val d = m * dsub
    val sc = embeddings.sparkSession.sparkContext
    val xs = embeddings.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
      .cache()
    val identity = Rotation(Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0))

    // one pass: for fixed (R, cb) accumulate M = Σ y·xᵀ (rotated-space
    // reconstruction y against RAW x) and the total distortion Σ‖R·x − y‖²
    def pass(rot: Rotation, cb: Pq.Codebook): (Array[Double], Double) = {
      val rotB = sc.broadcast(rot.matrix)
      val cbB = sc.broadcast(cb.codebooks)
      val (mAcc, dist) = xs.treeAggregate(
        (new Array[Double](d * d), 0.0))(
        seqOp = { case ((acc, dAcc), x) =>
          val rm = rotB.value
          val books = cbB.value
          val xr = new Array[Double](d)
          var i = 0
          while (i < d) {
            val row = rm(i); var s = 0.0; var j = 0
            while (j < d) { s += row(j) * x(j); j += 1 }
            xr(i) = s; i += 1
          }
          val y = new Array[Double](d)
          var sub = 0
          var dd = dAcc
          while (sub < books.length) {
            val book = book_(books, sub)
            val off = sub * dsub
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < book.length) {
              val cw = book(c); var s = 0.0; var j = 0
              while (j < dsub) {
                val t = xr(off + j) - cw(j); s += t * t; j += 1
              }
              if (s < bestD) { bestD = s; best = c }
              c += 1
            }
            val cw = book(best)
            var j = 0
            while (j < dsub) { y(off + j) = cw(j); j += 1 }
            dd += bestD
            sub += 1
          }
          var r = 0
          while (r < d) {
            val yr = y(r); val base = r * d
            var cc = 0
            while (cc < d) { acc(base + cc) += yr * x(cc); cc += 1 }
            r += 1
          }
          (acc, dd)
        },
        combOp = { case ((a, da), (b, db)) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          (a, da + db)
        })
      rotB.destroy(); cbB.destroy()
      (mAcc, dist)
    }

    def procrustes(mFlat: Array[Double]): Rotation = {
      // row-major M(r)(c) = Σ y(r)·x(c); breeze is column-major → transpose
      // via (c, r) indexing
      val mB = new breeze.linalg.DenseMatrix(d, d,
        Array.tabulate(d * d)(i => mFlat((i % d) * d + i / d)))
      val svd = breeze.linalg.svd(mB)
      val r = svd.U * svd.Vt
      Rotation(Array.tabulate(d, d)((i, j) => r(i, j)))
    }

    val candidates = scala.collection.mutable.ArrayBuffer
      .empty[(Rotation, Pq.Codebook, Double)]
    var rot = identity
    var it = 0
    while (it <= iters) {
      val cb =
        if (it == 0)
          Pq.trainCodebook(embeddings, m, dsub, k, seed, vecCol, maxIter)
        else {
          val rotated = embeddings
            .withColumn("__rv", rotate(rot, col(vecCol))).cache()
          try {
            rotated.count()
            Pq.trainCodebook(rotated, m, dsub, k, seed, vecCol = "__rv",
              maxIter = maxIter)
          } finally rotated.unpersist(blocking = false)
        }
      val (mAcc, dist) = pass(rot, cb)
      candidates += ((rot, cb, dist))
      if (it < iters) rot = procrustes(mAcc)
      it += 1
    }
    xs.unpersist(blocking = false)
    // model selection by RECALL on the query workload (ties by
    // distortion): distortion alone is L2 reconstruction error and can
    // prefer a rotation whose ADC *ranking* is marginally worse for IP
    // top-k. Selection against the caller's workload is the same
    // workload-aware tuning pattern as [[NprobeTuner]] (the reference
    // auto-calibrates against live traffic, config.h:96-99); with no
    // workload given, a deterministic held-out corpus sample stands in.
    // Candidate 0 is exactly plain PQ (identity R, same seed/iters), so
    // the selected model's recall on the selection workload is ≥ plain
    // PQ by construction. At 100 TB both training and selection run on
    // the same bounded sample.
    if (candidates.length == 1) (candidates.head._1, candidates.head._2)
    else {
      val valQ = valQueries.getOrElse(
          embeddings.filter(col(idCol) % 13 === 0)
            .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
            .limit(200))
        .cache()
      val exact = graft.operators.Knn
        .exactBatch(valQ, embeddings, "ip", 10, idCol, vecCol)
        .select(col("query_id"), col(idCol)).cache()
      val nExact = exact.count().toDouble
      val scored = candidates.map { case (r, cb, dist) =>
        val rec =
          if (nExact == 0) 0.0
          else twoPhaseSearch(embeddings, encode(embeddings, r, cb, idCol, vecCol),
              r, cb, valQ, 10, 4, idCol, vecCol)
            .select(col("query_id"), col(idCol))
            .intersect(exact).count() / nExact
        (r, cb, dist, rec)
      }
      exact.unpersist(); valQ.unpersist()
      val best = scored.minBy { case (_, _, dist, rec) => (-rec, dist) }
      (best._1, best._2)
    }
  }

  // indirection so the closure reads the broadcast once per subspace
  @inline private def book_(books: Array[Array[Array[Double]]], sub: Int) =
    books(sub)

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

package graft.index

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** One packed inverted list: ids + row-major flat vectors (the serving
  * analogue of the reference's in-memory IVF list, config.h:74-82). Flat
  * primitive arrays — no per-row objects, no boxing — so a probe scan is a
  * tight sequential loop over contiguous floats. `tenants`/`tags` are
  * null unless the index was built with attribute columns (then aligned
  * row-wise with `ids`).
  */
final case class ListBlock(cid: Long, ids: Array[Long], vecs: Array[Float],
    dim: Int, tenants: Array[String] = null,
    tags: Array[Array[Long]] = null, vecsD: Array[Double] = null)

/** Per-request predicate for the serving path — the reference
  * QueryRequest's filter surface (types.h:67-75): tenant equality (Q2),
  * tags ANY-of (Q3), and the deterministic sample gate (sample_p,
  * config.h:78). Arithmetic matches the SQL paths exactly
  * ([[graft.operators.Knn.sampleFilter]]'s Knuth-multiplicative bucket).
  */
final case class ServingFilter(tenant: Option[String] = None,
    tagsAny: Option[Seq[Long]] = None, sampleP: Option[Int] = None) {
  def isEmpty: Boolean = tenant.isEmpty && tagsAny.isEmpty && sampleP.isEmpty
}

object ServingFilter {
  val none: ServingFilter = ServingFilter()
}

/** In-flight buffer tier for the serving path (T5/Q10 read-your-writes on
  * serving; reference msg-buf.h buffer + segments with version masking):
  * the mutations accepted since the index was last rebuilt, held
  * driver-side. Bounded by flush cadence — the measured delta-resident
  * fraction is ~2%, and the reference's buffer is capped by the flush
  * threshold (config.h:29) — so the overlay stays MBs even for a large
  * served corpus; rebuild the index and drain on flush.
  *
  * Semantics match [[graft.operators.TieredScan.liveView]]: any overlay
  * version of an id SHADOWS the stored version (buffer epochs are ≥
  * flushed epochs by construction), the overlay's own LWW winner
  * represents the id, and tombstoned winners mask without becoming
  * candidates.
  */
final class ServingOverlay private (
    private[index] val shadowed: Set[Long],
    private[index] val winners: Array[(Long, Long, Array[Double])]) // (id, cid, vec)
    extends Serializable {
  def size: Int = winners.length
}

object ServingOverlay {
  /** Build from buffered mutation rows
    * (cols: idCol, epoch, deleted, centroid_id, vecCol). Vectors are held
    * as doubles — exact for float sources, lossless for double sources —
    * so overlay scores match the SQL paths bit-for-bit.
    */
  def fromDataFrame(buffer: DataFrame, idCol: String = "vec_id",
      vecCol: String = "vec"): ServingOverlay = {
    val rows = buffer
      .select(col(idCol).cast("long"), col("epoch").cast("long"),
        col("deleted").cast("boolean"), col("centroid_id").cast("long"),
        col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getSeq[Double](4).toArray))
    val byId = rows.groupBy(_._1)
    val winners = byId.valuesIterator
      .map(_.maxBy(_._2)) // LWW within the buffer
      .collect { case (id, _, deleted, cid, vec) if !deleted && vec != null =>
        (id, cid, vec)
      }
      .toArray
    new ServingOverlay(byId.keySet, winners)
  }
}

private final class ExactPartitioner(n: Int) extends Partitioner {
  override def numPartitions: Int = n
  override def getPartition(key: Any): Int = key.asInstanceOf[Int]
}

/** Single-request IVF serving index (SURVEY Q6 serving path; BASELINE
  * 150 ms p99, reference types.h:141).
  *
  * The batch path ([[Ivf.search]]) and the per-request SQL path
  * ([[Ivf.searchPoint]]) both pay per-request costs a resident server
  * shouldn't: a fresh Catalyst analyze/optimize cycle per query (the plan
  * differs in its literals) and a task per cached partition even for
  * unprobed lists. This index removes both:
  *
  *  - the corpus lives as packed [[ListBlock]]s in a cached RDD partitioned
  *    ONE LIST PER PARTITION — the distributed analogue of the reference's
  *    in-memory inverted lists, still spread across executors;
  *  - a request is `sc.runJob(blocks, scan, probedPartitions)`: the
  *    scheduler dispatches ONLY the nprobe probed partitions (true
  *    scheduler-level partition pruning — nprobe tasks, not nlist), each
  *    task runs a codegen-equivalent tight-loop scan with a bounded top-k,
  *    and the driver merges nprobe k-row partials. No SQL planning, no
  *    shuffle, no broadcast — per-request cost is probe-task dispatch plus
  *    the probed fraction's scan.
  *
  * Score arithmetic is bit-identical to the codegen kernels
  * (VectorExpressions.DotProduct / L2SqDistance: sequential double
  * accumulation over float reads) and probe selection is bit-identical to
  * [[Ivf.searchPoint]], so results hash-match the batch path and the DuckDB
  * oracle (gated by `knn_point_served`).
  *
  * At 1000 executors this is exactly the layout you'd want: each executor
  * holds a slice of the lists, a request touches nprobe of them, and
  * scheduler locality sends each probe task to the executor caching that
  * list. Refresh on flush/compaction by rebuilding from the stored layout
  * ([[ServingIndex.buildStored]]) — the index is a read-optimized snapshot,
  * versioned by the segment tree it was built from, matching the
  * reference's rebuild-on-flush serving design.
  */
final class ServingIndex private (
    @transient private val blocks: RDD[ListBlock],
    val cids: Array[Long],
    val matrix: Array[Array[Double]],
    private val cidToPart: Map[Long, Int],
    val metric: String,
    val dim: Int) extends Serializable {

  private val asc = graft.operators.Knn.isAscending(metric)

  /** nprobe nearest centroids for q — identical arithmetic and (d, cid)
    * tie-break to [[Ivf.searchPoint]]/[[Ivf.probes]].
    */
  def probe(q: Array[Float], nprobe: Int): Seq[Long] =
    Ivf.probePick(q, cids, matrix, nprobe)

  /** One QueryRequest: top-k over the probed lists, optionally through
    * the request's tenant/tags/sample predicate (evaluated in-task before
    * scoring — filtered rows never pay a dot product). Returns (id, score)
    * in final rank order (score best-first, ties by id asc).
    */
  def search(q: Array[Float], k: Int, nprobe: Int,
      filter: ServingFilter = ServingFilter.none): Array[(Long, Double)] = {
    val probed = probe(q, nprobe)
    val parts = probed.flatMap(cidToPart.get).distinct.toArray
    if (parts.isEmpty) return Array.empty
    val probedSet = probed.toSet
    val m = metric
    val ascL = asc
    val partials: Array[Array[(Long, Double)]] = blocks.sparkContext.runJob(
      blocks,
      (it: Iterator[ListBlock]) =>
        ServingIndex.scanTopK(it, q, k, m, ascL, probedSet, filter),
      parts.toIndexedSeq)
    val merged = partials.flatten.sortBy {
      case (id, s) => (if (ascL) s else -s, id)
    }
    merged.take(k)
  }

  /** Tiered request: stored index + in-flight buffer overlay with version
    * masking — the serving-path twin of the tiered read
    * ([[graft.operators.TieredScan.liveView]] semantics). Stored rows
    * whose id has ANY buffered version are skipped in-task (the shadow
    * set ships with the probe job — it is delta-fraction small); the
    * overlay's live LWW winners within the probed lists join the
    * candidate pool driver-side with the same score arithmetic. Overlay
    * scan cost is O(overlay) per request on the driver — microseconds at
    * the measured 2% delta fraction.
    */
  def searchWithOverlay(q: Array[Float], k: Int, nprobe: Int,
      overlay: ServingOverlay): Array[(Long, Double)] = {
    val probed = probe(q, nprobe)
    val probedSet = probed.toSet
    val parts = probed.flatMap(cidToPart.get).distinct.toArray
    val m = metric
    val ascL = asc
    val shadow = overlay.shadowed
    val partials: Array[Array[(Long, Double)]] =
      if (parts.isEmpty) Array.empty
      else blocks.sparkContext.runJob(
        blocks,
        (it: Iterator[ListBlock]) =>
          ServingIndex.scanTopK(it, q, k, m, ascL, probedSet,
            ServingFilter.none, shadow),
        parts.toIndexedSeq)
    val overlayCands = overlay.winners.iterator
      .filter(w => probedSet.contains(w._2))
      .map(w => (w._1, ServingIndex.scoreOne(q, w._3, m)))
      .toArray
    (partials.flatten ++ overlayCands)
      .sortBy { case (id, s) => (if (ascL) s else -s, id) }
      .take(k)
  }

  /** Battery/verify helper: a request loop over `queries`, results as a
    * DataFrame (query_id, vec_id, score) — k rows per request, built on
    * the driver (the serving pattern: each query IS an independent
    * request; only O(queries × k) rows ever reach the driver).
    */
  def searchAllDF(spark: SparkSession, queries: Seq[(Long, Array[Float])],
      k: Int, nprobe: Int,
      filter: ServingFilter = ServingFilter.none,
      overlay: Option[ServingOverlay] = None): DataFrame = {
    val rows = queries.flatMap { case (qid, qv) =>
      val hits = overlay match {
        case Some(o) => searchWithOverlay(qv, k, nprobe, o)
        case None => search(qv, k, nprobe, filter)
      }
      hits.map { case (id, s) => Row(qid, id, s) }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("query_id", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))))
  }

  def unpersist(): Unit = blocks.unpersist()
}

object ServingIndex {

  /** Build from an assigned snapshot (cols: centroid_id, idCol, vecCol).
    * One shuffle (partition by list), then each list packs into flat
    * arrays and is cached where it landed. Build is the B2 index-build
    * step — untimed in serving terms, rerun on refresh.
    */
  def build(assigned: DataFrame, centroids: DataFrame, metric: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      tenantCol: Option[String] = None,
      tagsCol: Option[String] = None): ServingIndex = {
    val (cids, matrix) = Ivf.collectCentroids(centroids)
    val cidToPart = cids.zipWithIndex.toMap
    val dim = matrix.headOption.map(_.length).getOrElse(0)
    val hasTenant = tenantCol.isDefined
    val hasTags = tagsCol.isDefined
    // precision follows the source: float embeddings pack as float[]
    // (half the memory at serving scale), double vectors (e.g. segment
    // `vec` columns) pack as double[] — a float downcast would shift
    // scores off the SQL paths by ulps and break the oracle hash
    val isDouble =
      assigned.schema(vecCol).dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _) => true
        case _ => false
      }
    val vecType = if (isDouble) "array<double>" else "array<float>"
    val cols = Seq(col("centroid_id").cast("long"),
        col(idCol).cast("long"), col(vecCol).cast(vecType)) ++
      tenantCol.map(c => col(c).cast("string")) ++
      tagsCol.map(c => col(c).cast("array<long>"))
    val tenantIdx = 3
    val tagsIdx = if (hasTenant) 4 else 3
    val keyed = assigned.select(cols: _*).rdd
      .flatMap { r =>
        val cid = r.getLong(0)
        cidToPart.get(cid).map { p =>
          val vec: AnyRef =
            if (isDouble) r.getSeq[Double](2).toArray
            else r.getSeq[Float](2).toArray
          (p, (cid, r.getLong(1), vec,
            if (hasTenant) r.getString(tenantIdx) else null,
            if (hasTags) r.getSeq[Long](tagsIdx).toArray else null))
        }
      }
    val blocks = keyed
      .partitionBy(new ExactPartitioner(cids.length))
      .mapPartitions({ it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val cid = rows.head._2._1
          val n = rows.length
          val d =
            if (isDouble) rows.head._2._3.asInstanceOf[Array[Double]].length
            else rows.head._2._3.asInstanceOf[Array[Float]].length
          val ids = new Array[Long](n)
          val vecsF = if (isDouble) null else new Array[Float](n * d)
          val vecsD = if (isDouble) new Array[Double](n * d) else null
          val tenants = if (hasTenant) new Array[String](n) else null
          val tags = if (hasTags) new Array[Array[Long]](n) else null
          var i = 0
          while (i < n) {
            ids(i) = rows(i)._2._2
            if (isDouble)
              System.arraycopy(rows(i)._2._3.asInstanceOf[Array[Double]],
                0, vecsD, i * d, d)
            else
              System.arraycopy(rows(i)._2._3.asInstanceOf[Array[Float]],
                0, vecsF, i * d, d)
            if (hasTenant) tenants(i) = rows(i)._2._4
            if (hasTags) tags(i) = rows(i)._2._5
            i += 1
          }
          Iterator.single(ListBlock(cid, ids, vecsF, d, tenants, tags,
            vecsD))
        }
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_ONLY)
    blocks.count() // materialize the cache — build step, not query latency
    new ServingIndex(blocks, cids, matrix, cidToPart, metric, dim)
  }

  /** Build from the stored segment layout: latest-live masking first
    * (same store-wide narrow LWW as [[Ivf.searchStored]]), then pack.
    * The serving refresh path after a flush/compaction.
    */
  def buildStored(spark: SparkSession, baseDir: String, centroids: DataFrame,
      metric: String): ServingIndex = {
    import graft.segments.Segments
    val all = Segments.readSegments(spark, baseDir)
    val latestLive = graft.operators.Lww.latestBy(
        all.select(col("id_hash"), col("epoch"), col("deleted")),
        "id_hash", "epoch")
      .filter(!col("deleted"))
      .select(col("id_hash"), col("epoch"))
    build(all.join(latestLive, Seq("id_hash", "epoch")), centroids, metric,
      idCol = "vec_id", vecCol = "vec")
  }

  /** Per-task probe scan: tight loop over a packed list, bounded top-k
    * with (score, id-asc) tie-break. Double accumulation over float reads
    * in index order — bit-identical to the codegen DotProduct/L2SqDistance
    * kernels.
    */
  /** Single-vector score with the exact kernel arithmetic of [[scanTopK]]
    * (sequential double accumulation) — used for driver-side overlay
    * candidates so tiered results hash-match the SQL paths.
    */
  private[index] def scoreOne(q: Array[Float], v: Array[Double],
      metric: String): Double = {
    val d = q.length
    var s = 0.0
    var i = 0
    if (metric == "l2") {
      while (i < d) {
        val diff = q(i).toDouble - v(i).toDouble; s += diff * diff; i += 1
      }
    } else {
      while (i < d) { s += q(i).toDouble * v(i).toDouble; i += 1 }
      if (metric == "cosine") {
        var nq = 0.0; var nv = 0.0; var j = 0
        while (j < d) {
          nq += q(j).toDouble * q(j).toDouble
          nv += v(j).toDouble * v(j).toDouble
          j += 1
        }
        s = s / (math.sqrt(nq) * math.sqrt(nv))
      }
    }
    s
  }

  private[index] def scanTopK(it: Iterator[ListBlock], q: Array[Float],
      k: Int, metric: String, asc: Boolean, probed: Set[Long],
      filter: ServingFilter = ServingFilter.none,
      skipIds: Set[Long] = Set.empty): Array[(Long, Double)] = {
    val wantTenant = filter.tenant.orNull
    val wantTags = filter.tagsAny.map(_.toArray).orNull
    val sampleP = filter.sampleP.getOrElse(-1)
    // insertion top-k: k is small (reference max_k 100, config.h:180);
    // arrays, no allocation per candidate
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0
    def better(s: Double, id: Long, j: Int): Boolean = {
      val sj = scores(j)
      if (asc) s < sj || (s == sj && id < ids(j))
      else s > sj || (s == sj && id < ids(j))
    }
    def insert(s: Double, id: Long): Unit = {
      if (size < k) {
        // append then sift up (arrays stay sorted best-first)
        var p = size
        scores(p) = s; ids(p) = id
        while (p > 0 && better(scores(p), ids(p), p - 1)) {
          val ts = scores(p); val ti = ids(p)
          scores(p) = scores(p - 1); ids(p) = ids(p - 1)
          scores(p - 1) = ts; ids(p - 1) = ti
          p -= 1
        }
        size += 1
      } else if (better(s, id, k - 1)) {
        var p = k - 1
        scores(p) = s; ids(p) = id
        while (p > 0 && better(scores(p), ids(p), p - 1)) {
          val ts = scores(p); val ti = ids(p)
          scores(p) = scores(p - 1); ids(p) = ids(p - 1)
          scores(p - 1) = ts; ids(p - 1) = ti
          p -= 1
        }
      }
    }
    // per-row predicate, cheapest test first — a rejected row never pays
    // a dot product. Sample arithmetic = Knn.sampleFilter's
    // pmod(vec_id · 2654435761, 100) < p, wrap-and-positive-mod exactly.
    def pass(b: ListBlock, r: Int): Boolean = {
      if (skipIds.nonEmpty && skipIds.contains(b.ids(r))) return false
      if (sampleP >= 0) {
        val m = (b.ids(r) * 2654435761L) % 100L
        if ((if (m < 0) m + 100L else m) >= sampleP) return false
      }
      if (wantTenant != null &&
        (b.tenants == null || b.tenants(r) != wantTenant)) return false
      if (wantTags != null) {
        if (b.tags == null) return false
        val rowTags = b.tags(r)
        if (rowTags == null) return false
        var hit = false
        var i = 0
        while (!hit && i < wantTags.length) {
          var j = 0
          while (!hit && j < rowTags.length) {
            if (rowTags(j) == wantTags(i)) hit = true
            j += 1
          }
          i += 1
        }
        if (!hit) return false
      }
      true
    }
    while (it.hasNext) {
      val b = it.next()
      if (probed.contains(b.cid)) {
        val d = b.dim
        val n = b.ids.length
        val vf = b.vecs
        val vd = b.vecsD
        // element read dispatches on the packed precision OUTSIDE the
        // per-dimension loop cost path (JIT specializes each branch);
        // (double)float reads are exact, so both paths match the codegen
        // kernels bit-for-bit
        var r = 0
        while (r < n) {
          if (!pass(b, r)) { r += 1 }
          else {
          val off = r * d
          var s = 0.0
          var i = 0
          if (metric == "l2") {
            if (vd != null)
              while (i < d) {
                val diff = q(i).toDouble - vd(off + i)
                s += diff * diff; i += 1
              }
            else
              while (i < d) {
                val diff = q(i).toDouble - vf(off + i).toDouble
                s += diff * diff; i += 1
              }
          } else {
            // ip and cosine share the dot loop; cosine normalizes below
            if (vd != null)
              while (i < d) { s += q(i).toDouble * vd(off + i); i += 1 }
            else
              while (i < d) {
                s += q(i).toDouble * vf(off + i).toDouble; i += 1
              }
            if (metric == "cosine") {
              var nq = 0.0; var nv = 0.0; var j = 0
              while (j < d) {
                nq += q(j).toDouble * q(j).toDouble
                val x = if (vd != null) vd(off + j) else vf(off + j).toDouble
                nv += x * x
                j += 1
              }
              // IEEE division, no zero guard — exactly cosineD's
              // dot/(sqrt·sqrt) op order
              s = s / (math.sqrt(nq) * math.sqrt(nv))
            }
          }
          insert(s, b.ids(r))
          r += 1
          }
        }
      }
    }
    val out = new Array[(Long, Double)](size)
    var j = 0
    while (j < size) { out(j) = (ids(j), scores(j)); j += 1 }
    out
  }
}

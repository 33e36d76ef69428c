package graft.index

import scala.collection.mutable

/** Q14: HNSW hot cache (reference HNSWCacheConfig, config.h:102-108 —
  * disabled by default there; implemented here to complete the operator
  * surface). The reference keeps an HNSW graph over the hottest vectors
  * IN FRONT of the IVF store; this is that exact role on Spark: the
  * graph is a DRIVER-side structure (a cache over ≤ max_elements
  * vectors — the reference's own cap is 1M, driver-memory-sized at any
  * dim the engine serves), while the corpus itself stays in the
  * distributed [[ServingIndex]]. A request probes the cache first and
  * falls back to the probe job when the cache can't answer.
  *
  * The graph is the standard Hierarchical Navigable Small World
  * construction (Malkov & Yashunin 2016, public algorithm):
  * geometric level assignment, greedy descent through the upper
  * layers, beam (ef) search with an M-bounded neighbor selection per
  * layer. Two departures matter operationally:
  *
  *  - DETERMINISM: levels come from a hash of the id (not a PRNG), and
  *    all candidate orderings tie-break on id — identical inputs build
  *    identical graphs and return identical results, matching the
  *    engine-wide reproducibility contract;
  *  - metrics share [[ServingIndex.scoreOne]]'s arithmetic (sequential
  *    double accumulation), so cache answers are bit-comparable to the
  *    stored path's scores.
  */
final class Hnsw(val metric: String, val m: Int = 16,
    val efConstruction: Int = 200) {
  require(m >= 2, s"m=$m")
  private val asc = graft.operators.Knn.isAscending(metric)
  private val m0 = 2 * m // layer-0 degree bound, standard HNSW choice
  private val levelNorm = 1.0 / math.log(m.toDouble)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val idToNode = mutable.LongMap.empty[Int]
  // neighbors(node)(layer) -> node ids (graph adjacency, bounded M/M0)
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry: Int = -1
  private var maxLevel: Int = -1

  def size: Int = ids.length
  def contains(id: Long): Boolean = idToNode.contains(id)

  /** Deterministic level: a splitmix64 finalizer over the id drives the
    * geometric draw (u uniform in (0,1] from 20 hash bits),
    * level = ⌊−ln(u)·mL⌋ — the standard HNSW distribution without a PRNG.
    */
  private def levelOf(id: Long): Int = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val u = (((z >>> 44) & 0xFFFFF).toDouble + 1.0) / 1048576.0
    math.floor(-math.log(u) * levelNorm).toInt
  }

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val d = a.length
    if (metric == "l2") {
      while (i < d) {
        val diff = a(i).toDouble - b(i).toDouble; s += diff * diff; i += 1
      }
    } else {
      while (i < d) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      if (metric == "cosine") {
        var na = 0.0; var nb = 0.0; var j = 0
        while (j < d) {
          na += a(j).toDouble * a(j).toDouble
          nb += b(j).toDouble * b(j).toDouble
          j += 1
        }
        s = s / (math.sqrt(na) * math.sqrt(nb))
      }
    }
    s
  }

  /** better(x, y): x strictly preferred to y under the metric, id ties
    * broken ascending for determinism.
    */
  private def better(sx: Double, ix: Int, sy: Double, iy: Int): Boolean =
    if (asc) sx < sy || (sx == sy && ids(ix) < ids(iy))
    else sx > sy || (sx == sy && ids(ix) < ids(iy))

  /** Beam search on one layer from `start`: the ef best nodes found. */
  private def searchLayer(q: Array[Float], start: Int, ef: Int,
      layer: Int): mutable.ArrayBuffer[(Double, Int)] = {
    val visited = mutable.BitSet(start)
    val sStart = dist(q, vecs(start))
    // Scala's PriorityQueue dequeues the ordering's MAXIMUM — make the
    // best element the maximum so the beam expands best-first
    val candOrd: Ordering[(Double, Int)] = Ordering.fromLessThan {
      case ((sa, ia), (sb, ib)) => better(sb, ib, sa, ia)
    }
    val cand = mutable.PriorityQueue((sStart, start))(candOrd)
    // res kept sorted best-first (binary-insert); worst is res.last
    val res = mutable.ArrayBuffer.empty[(Double, Int)]
    def insertRes(e: (Double, Int)): Unit = {
      var lo = 0
      var hi = res.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (better(e._1, e._2, res(mid)._1, res(mid)._2)) hi = mid
        else lo = mid + 1
      }
      res.insert(lo, e)
      if (res.length > ef) res.remove(res.length - 1)
    }
    insertRes((sStart, start))
    while (cand.nonEmpty) {
      val (sc, c) = cand.dequeue()
      val worst = res.last
      if (res.length >= ef && !better(sc, c, worst._1, worst._2)) {
        cand.clear() // every remaining candidate is worse — done
      } else {
        val nbrs = neighbors(c)(layer)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (!visited(nb)) {
            visited += nb
            val s = dist(q, vecs(nb))
            val w = res.last
            if (res.length < ef || better(s, nb, w._1, w._2)) {
              cand.enqueue((s, nb))
              insertRes((s, nb))
            }
          }
          i += 1
        }
      }
    }
    res
  }

  /** Bounded neighbor selection: simple best-M (the original paper's
    * SELECT-NEIGHBORS-SIMPLE) — deterministic given the tie-break.
    */
  private def selectM(cands: mutable.ArrayBuffer[(Double, Int)],
      bound: Int): mutable.ArrayBuffer[Int] = {
    val sorted = cands.sortWith { case ((sa, ia), (sb, ib)) =>
      better(sa, ia, sb, ib)
    }
    sorted.take(bound).map(_._2)
  }

  def insert(id: Long, vec: Array[Float]): Unit = {
    if (idToNode.contains(id)) return // cache insert is idempotent
    // one dimension per graph — a mismatched insert would poison every
    // later dist() against it (W13 normalizes but never reshapes)
    require(entry < 0 || vec.length == vecs(entry).length,
      s"insert dim ${vec.length} != collection dim ${vecs(entry).length}")
    val node = ids.length
    val level = levelOf(id)
    ids += id
    vecs += vec
    idToNode(id) = node
    neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = node; maxLevel = level; return }
    var ep = entry
    // greedy descent through layers above the new node's level
    var l = maxLevel
    while (l > level) {
      var changed = true
      var s = dist(vec, vecs(ep))
      while (changed) {
        changed = false
        val nbrs = neighbors(ep)(l)
        var i = 0
        while (i < nbrs.length) {
          val d = dist(vec, vecs(nbrs(i)))
          if (better(d, nbrs(i), s, ep)) { s = d; ep = nbrs(i); changed = true }
          i += 1
        }
      }
      l -= 1
    }
    // connect on each layer from min(level, maxLevel) down to 0
    var layer = math.min(level, maxLevel)
    while (layer >= 0) {
      val found = searchLayer(vec, ep, efConstruction, layer)
      val bound = if (layer == 0) m0 else m
      val chosen = selectM(found, bound)
      neighbors(node)(layer) = chosen.clone()
      // backlinks, pruned to the bound by the same selection
      chosen.foreach { nb =>
        val nl = neighbors(nb)(layer)
        nl += node
        if (nl.length > bound) {
          val scored = nl.map(x => (dist(vecs(nb), vecs(x)), x))
          neighbors(nb)(layer) = selectM(scored, bound)
        }
      }
      ep = found.head._2
      layer -= 1
    }
    if (level > maxLevel) { maxLevel = level; entry = node }
  }

  /** Top-k via beam search with width ef (reference default ef=50). */
  def search(q: Array[Float], k: Int, ef: Int = 50): Array[(Long, Double)] = {
    if (entry < 0) return Array.empty
    // fixed collection dimension (config.h:19-21) — reject mismatches at
    // the request boundary; the dist loop runs over q.length, so a long
    // query would read past row vectors and a short one would silently
    // score a truncated prefix
    require(q.length == vecs(entry).length,
      s"query dim ${q.length} != collection dim ${vecs(entry).length}")
    var ep = entry
    var l = maxLevel
    while (l > 0) {
      var changed = true
      var s = dist(q, vecs(ep))
      while (changed) {
        changed = false
        val nbrs = neighbors(ep)(l)
        var i = 0
        while (i < nbrs.length) {
          val d = dist(q, vecs(nbrs(i)))
          if (better(d, nbrs(i), s, ep)) { s = d; ep = nbrs(i); changed = true }
          i += 1
        }
      }
      l -= 1
    }
    searchLayer(q, ep, math.max(ef, k), 0)
      .take(k)
      .map { case (s, n) => (ids(n), s) }
      .toArray
  }

  /** Exact top-k over the graph's own vectors (linear scan, same
    * [[dist]] arithmetic) — the calibration ground truth for
    * [[Hnsw.tuneEf]]. O(size·dim) per call: calibration-only, never a
    * serving path.
    */
  def exactTopK(q: Array[Float], k: Int): Array[(Long, Double)] = {
    val scored = new Array[(Double, Int)](vecs.length)
    var i = 0
    while (i < vecs.length) { scored(i) = (dist(q, vecs(i)), i); i += 1 }
    // metric direction + id tie-break exactly as [[better]]
    scored.sortBy { case (s, n) => (if (asc) s else -s, ids(n)) }
      .take(k).map { case (s, n) => (ids(n), s) }
  }
}

object Hnsw {

  /** Q13-for-ef: the nprobe tuner's discipline applied to the HNSW beam
    * width (the reference tunes nprobe within bands for its recall
    * target, config.h:138-147; the cache's quality knob is `ef`).
    * Doubling sweep from max(k, efLo) to efHi: for each candidate,
    * mean recall@k of the beam search against [[Hnsw.exactTopK]] over
    * the query sample; picks the SMALLEST ef meeting `target` (falls
    * back to efHi with its achieved recall when none does — disclosed,
    * never silently under target). Unlike nprobe, a narrower beam is
    * not a prefix of a wider one, so each candidate reruns the search —
    * calibration cost, paid offline on a sample.
    */
  def tuneEf(graph: Hnsw, queries: Seq[Array[Float]], k: Int,
      target: Double, efLo: Int = 16,
      efHi: Int = 1024): (Int, Double) = {
    require(queries.nonEmpty, "ef sweep needs a query sample")
    val truth = queries.map(q =>
      graph.exactTopK(q, k).map(_._1).toSet)
    def recallAt(ef: Int): Double =
      queries.zip(truth).map { case (q, t) =>
        if (t.isEmpty) 1.0
        else graph.search(q, k, ef).count(r => t(r._1)).toDouble / t.size
      }.sum / queries.size
    var ef = math.max(k, efLo)
    var r = recallAt(ef)
    while (r < target && ef < efHi) {
      ef = math.min(efHi, ef * 2)
      r = recallAt(ef)
    }
    (ef, r)
  }
}

/** The hot-vector cache in front of [[ServingIndex]] (reference
  * HNSWCacheConfig role): tracks per-id hit counts, admits the hottest
  * ids up to `maxElements` AND `maxBytes`, and serves requests from the
  * HNSW graph when it holds enough of the corpus to answer well —
  * otherwise falls through to the distributed probe path. `refresh`
  * rebuilds the graph from the current hot set (the cache analogue of
  * the serving index's rebuild-on-flush).
  *
  * BYTE budget: all three driver-resident tiers ([[LocalServingIndex]],
  * [[LocalPqIndex]], this cache) admit in the SAME byte-priced currency
  * as the reference's GlobalIndexConfig budget (`memory_cache_mb`,
  * yaml:89) — an element-count-only cap would let one tier's budget
  * depend on `dim` while its siblings are priced in bytes. An element
  * is priced as its vector (4·dim) + id (8) + graph links (≈3·m ints:
  * 2·m level-0 neighbors plus ~m across the geometrically-thinning
  * upper levels). Each tier takes its own `maxBytes` (default 512 MiB,
  * the reference's memory_cache_mb default) — the config's single
  * budget is wired by [[graft.Graft]], which SPLITS
  * `cfg.global.memoryCacheBytes` across whichever tiers it stands up,
  * so their sum never exceeds the configured budget. A tier
  * constructed directly gets the default slice, not a share of a
  * global ledger. `maxElements` remains as the reference's own
  * hnsw_cache knob (yaml:92) — the binding constraint is whichever
  * trips first.
  */
final class HnswHotCache(idx: ServingIndex, maxElements: Int = 1000000,
    m: Int = 16, efConstruction: Int = 200, ef: Int = 50,
    maxBytes: Long = LocalServingIndex.defaultMaxBytes) {
  private val hits = mutable.LongMap.empty[Long].withDefaultValue(0L)
  private var graph = new Hnsw(idx.metric, m, efConstruction)
  private var vecsById = mutable.LongMap.empty[Array[Float]]
  private var bytes = 0L
  private var efCur = ef

  /** The beam width requests currently use (constructor default until
    * [[tuneEf]] runs).
    */
  def currentEf: Int = efCur

  /** Calibrate the beam width against the config's recall target on a
    * query sample ([[Hnsw.tuneEf]] — the nprobe-tuner discipline for
    * the cache's quality knob). Sets [[currentEf]]; returns
    * (ef, achieved recall) — recall is vs the GRAPH's own corpus
    * (what subset is cached is admission policy, measured separately).
    */
  def tuneEf(queries: Seq[Array[Float]], k: Int,
      target: Double = 0.95): (Int, Double) = {
    val (e, r) = Hnsw.tuneEf(graph, queries, k, target)
    efCur = e
    (e, r)
  }

  def cacheSize: Int = graph.size

  /** Priced bytes of the admitted graph (same budget type as the other
    * driver-resident tiers' `cachedBytes`).
    */
  def cachedBytes: Long = bytes

  private def elementBytes(vec: Array[Float]): Long =
    4L * vec.length + 8L + 4L * (3L * m)

  /** Record result ids of a served request (admission signal).
    * Synchronized: requests are served concurrently (independent jobs,
    * guide §2.6) and the hit map is shared admission state — the lock
    * is uncontended relative to a request's own work.
    */
  def observe(resultIds: Iterable[Long]): Unit = synchronized {
    resultIds.foreach(id => hits(id) = hits(id) + 1L)
  }

  /** Offer a vector for caching (e.g. from request results or a warm
    * scan); kept driver-side until the next refresh admits it.
    */
  def offer(id: Long, vec: Array[Float]): Unit =
    if (!vecsById.contains(id)) vecsById(id) = vec

  /** Rebuild the graph over the hottest offered ids, admitted
    * hottest-first (hit count desc, id asc — deterministic) while BOTH
    * budgets hold: ≤ maxElements elements and ≤ maxBytes priced bytes.
    */
  def refresh(): Unit = {
    val ranked = vecsById.keys.toArray.sortBy(id => (-hits(id), id))
    val g = new Hnsw(idx.metric, m, efConstruction)
    var b = 0L
    var i = 0
    while (i < ranked.length && g.size < maxElements) {
      val vec = vecsById(ranked(i))
      val eb = elementBytes(vec)
      if (b + eb <= maxBytes) { g.insert(ranked(i), vec); b += eb }
      i += 1
    }
    graph = g
    bytes = b
  }

  /** Serve: cache first when it can plausibly answer (holds ≥ 4·k
    * vectors), else the distributed probe path; cache answers are
    * APPROXIMATE over the hot subset — the fallback is the
    * ground-truth-complete path, mirroring the reference's cache-miss
    * flow.
    */
  def search(q: Array[Float], k: Int, nprobe: Int): Array[(Long, Double)] = {
    val res =
      if (graph.size >= k * 4) graph.search(q, k, efCur)
      else idx.search(q, k, nprobe)
    observe(res.map(_._1))
    res
  }
}

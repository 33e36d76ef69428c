package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = emb
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def brute(q: Array[Float], k: Int,
      metric: String): Seq[(Long, Double)] = {
    val asc = graft.operators.Knn.isAscending(metric)
    rows.map { case (id, v) =>
      (id, ServingIndex.scoreOne(q, v.map(_.toDouble), metric))
    }.sortBy { case (id, s) => (if (asc) s else -s, id) }.take(k).toSeq
  }

  test("HNSW recall@10 >= 0.9 vs brute force at reference parameters, every metric") {
    for (metric <- Seq("ip", "l2", "cosine")) {
      val g = new Hnsw(metric, m = 16, efConstruction = 200)
      rows.foreach { case (id, v) => g.insert(id, v) }
      assert(g.size === rows.length)
      val queries = rows.filter(_._1 % 25 == 0)
      val recalls = queries.map { case (_, qv) =>
        val got = g.search(qv, 10, ef = 50).map(_._1).toSet
        val want = brute(qv, 10, metric).map(_._1).toSet
        got.intersect(want).size.toDouble / want.size
      }
      val mean = recalls.sum / recalls.length
      assert(mean >= 0.9, s"metric=$metric recall=$mean")
    }
  }

  test("ef auto-tune: smallest band ef meeting the recall target; exactTopK agrees with brute force") {
    val g = new Hnsw("ip", m = 16, efConstruction = 200)
    rows.foreach { case (id, v) => g.insert(id, v) }
    val queries = rows.filter(_._1 % 25 == 0).map(_._2).toSeq
    // exactTopK IS brute force (same arithmetic, same tie-break)
    queries.take(5).foreach { qv =>
      assert(g.exactTopK(qv, 10).map(_._1).toSeq ===
        brute(qv, 10, "ip").map(_._1))
    }
    val target = 0.95
    val (ef, recall) = Hnsw.tuneEf(g, queries, k = 10, target = target)
    assert(recall >= target, s"ef=$ef recall=$recall")
    // picked ef is the SMALLEST on the doubling ladder meeting target:
    // the next rung down (if any) must miss it
    if (ef > 16) {
      val below = queries.map { qv =>
        val t = g.exactTopK(qv, 10).map(_._1).toSet
        g.search(qv, 10, ef / 2).count(r => t(r._1)).toDouble / t.size
      }.sum / queries.size
      assert(below < target, s"ef/2=${ef / 2} already meets: $below")
    }
    // the cache serves at the tuned width
    val cents = Ivf.deterministicCentroids(emb, 50)
    val idx = ServingIndex.build(Ivf.assign(emb, cents), cents, "ip")
    try {
      val cache = new HnswHotCache(idx, maxElements = rows.length)
      rows.foreach { case (id, v) => cache.offer(id, v) }
      cache.refresh()
      assert(cache.currentEf === 50) // constructor default until tuned
      val (efC, recC) = cache.tuneEf(queries, k = 10, target = target)
      assert(cache.currentEf === efC && recC >= target)
      // served results at the tuned ef match the graph's own at that ef
      val qv = queries.head
      assert(cache.search(qv, 10, nprobe = 4).toSeq ===
        g.search(qv, 10, efC).toSeq)
    } finally idx.unpersist()
  }

  test("construction and search are deterministic (hash levels, id tie-breaks)") {
    def build() = {
      val g = new Hnsw("ip")
      rows.foreach { case (id, v) => g.insert(id, v) }
      g
    }
    val g1 = build(); val g2 = build()
    rows.take(10).foreach { case (_, qv) =>
      assert(g1.search(qv, 10).toSeq === g2.search(qv, 10).toSeq)
    }
    // insert is idempotent (cache semantics)
    val g3 = build()
    rows.take(5).foreach { case (id, v) => g3.insert(id, v) }
    assert(g3.size === rows.length)
  }

  test("scores are bit-identical to the serving kernel arithmetic") {
    val g = new Hnsw("ip")
    rows.foreach { case (id, v) => g.insert(id, v) }
    val qv = rows.head._2
    val got = g.search(qv, 5, ef = rows.length).toSeq
    // at ef = corpus size the beam is exhaustive → exactly brute force
    assert(got === brute(qv, 5, "ip"))
  }

  test("hot cache: cold requests fall through to the probe path, refresh admits the hot set, cache answers match") {
    val cents = Ivf.deterministicCentroids(emb, 50)
    val idx = ServingIndex.build(Ivf.assign(emb, cents), cents, "ip")
    val cache = new HnswHotCache(idx, maxElements = 200, ef = 64)
    val qv = rows.head._2
    // cold: graph empty → served by the distributed index
    val cold = cache.search(qv, 10, nprobe = 1000)
    assert(cold.toSeq === idx.search(qv, 10, 1000).toSeq)
    assert(cache.cacheSize === 0)
    // offer the whole corpus, refresh → hottest ids admitted (capped)
    rows.foreach { case (id, v) => cache.offer(id, v) }
    cache.refresh()
    assert(cache.cacheSize === math.min(200, rows.length))
    // warm: served from the graph; over a full-corpus cache at high ef
    // the answer matches the exact top-k
    val full = new HnswHotCache(idx, maxElements = rows.length,
      ef = rows.length)
    rows.foreach { case (id, v) => full.offer(id, v) }
    full.refresh()
    val warm = full.search(qv, 10, nprobe = 1000)
    assert(warm.toSeq === brute(qv, 10, "ip"))
    idx.unpersist()
  }

  test("hot cache admits by the shared byte budget (one memory_cache_mb over all driver tiers)") {
    val cents = Ivf.deterministicCentroids(emb, 50)
    val idx = ServingIndex.build(Ivf.assign(emb, cents), cents, "ip")
    val dim = rows.head._2.length
    val mParam = 16
    val perElem = 4L * dim + 8L + 4L * (3L * mParam) // the priced formula
    // budget for exactly 7 elements: count cap is loose, bytes bind
    val cache = new HnswHotCache(idx, maxElements = 1000000, m = mParam,
      ef = 64, maxBytes = perElem * 7 + perElem / 2)
    rows.foreach { case (id, v) => cache.offer(id, v) }
    // make ids 3,1,4 hottest so admission order is observable
    (0 until 5).foreach(_ => cache.observe(Seq(3L)))
    (0 until 4).foreach(_ => cache.observe(Seq(1L)))
    (0 until 3).foreach(_ => cache.observe(Seq(4L)))
    cache.refresh()
    assert(cache.cacheSize === 7)
    assert(cache.cachedBytes === perElem * 7)
    assert(cache.cachedBytes <= perElem * 7 + perElem / 2)
    // a zero budget admits nothing; requests fall through, never throw
    val none = new HnswHotCache(idx, maxElements = 1000000, m = mParam,
      ef = 64, maxBytes = 0L)
    rows.foreach { case (id, v) => none.offer(id, v) }
    none.refresh()
    assert(none.cacheSize === 0 && none.cachedBytes === 0L)
    val qv = rows.head._2
    assert(none.search(qv, 10, nprobe = 1000).toSeq ===
      idx.search(qv, 10, 1000).toSeq)
    idx.unpersist()
  }
}

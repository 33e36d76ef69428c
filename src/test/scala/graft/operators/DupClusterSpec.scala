package graft.operators

import graft.SparkSpec

class DupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("dupClusters labels components with their min doc_id") {
    // components: {1,2,3,7} (chain), {4,5}, singleton edges absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (4L, 5L))
      .toDF("a", "b")
    val got = DedupOps.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 4L))
  }

  test("dupClusters converges on a long chain within maxIter") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val got = DedupOps.dupClusters(chain, maxIter = 25)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L), got.mkString(","))
  }

  test("dupClusters matches a driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(12345)
    for (trial <- 0 until 3) {
      val n = 30 + rnd.nextInt(40)
      val m = 20 + rnd.nextInt(60)
      val edges = Seq.fill(m)(
          (rnd.nextInt(n).toLong + 1L, rnd.nextInt(n).toLong + 1L))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // union-find with union-by-min-root: by induction every tree's root
      // is its component's minimum id, so find(x) = the canonical label
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(x => (x, find(x))).toMap
      val got = DedupOps.dupClusters(edges.toDF("a", "b"), maxIter = 50)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("dupSourceMatrix: unordered source pairs, counts hand-checked") {
    val d = Seq((1L, "src_b"), (2L, "src_a"), (3L, "src_a"), (4L, "src_c"))
      .toDF("doc_id", "source")
    // pair (1,2) crosses b/a → normalized (a,b); (2,3) within a; (1,4) b/c
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val got = DedupOps.dupSourceMatrix(d, pairs)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(("src_a", "src_a", 1L), ("src_a", "src_b", 1L),
      ("src_b", "src_c", 1L)))
  }

  test("end-to-end: minhash pairs → clusters → canonical keep-set") {
    val pairs = DedupOps.minhashPairsOracle(docs, threshold = 0.9)
    val clusters = DedupOps.dupClusters(pairs)
    // canonical ids are their own cluster representative
    val bad = clusters.filter($"canonical_id" > $"doc_id").count()
    assert(bad === 0)
    // keep-set = all docs minus non-canonical members
    val dropped = clusters.filter($"canonical_id" =!= $"doc_id").count()
    assert(dropped > 0) // sf0.001 has real dups
  }
}

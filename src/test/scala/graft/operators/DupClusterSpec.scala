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

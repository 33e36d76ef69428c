package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout QUALITY gate for the two-level quantizer at nprobe < nlist —
  * the r7 verdict's open item: `knn_twolevel`'s probe-all battery entry
  * pins assignment completeness, but a degenerate layout passes it.
  * This spec runs the 100M fixture's own clustered generator
  * (Bench.synthVec100m — many near-orthogonal tight groups, the
  * distribution that made MLlib's coarse k-means collapse to one cell
  * holding 98.6% of the corpus, PLANS.md round 8) at spec scale and
  * gates the two properties the collapse destroyed:
  *
  *  1. BALANCE — list sizes must be within an order of magnitude of the
  *     mean (the broken layout's median list held 1 row, its hot lists
  *     ~2.3M);
  *  2. PRUNED RECALL — exact-scored IVF search probing 1/8 of the lists
  *     must keep recall@10 ≥ 0.9 vs the exact scan (PQ excluded on
  *     purpose: this isolates the LAYOUT; code quality is gated by the
  *     PQ/OPQ suites and the 100M ladder).
  */
class TwoLevelRecallSpec extends SparkSpec {
  import spark.implicits._

  private val d = 768
  private val n = 20000
  private val groups = 200L // ~100 members per group
  private val k1 = 8
  private val k2 = 8

  private lazy val corpus = {
    val rows = (0L until n.toLong).map(id =>
      (id, graft.Bench.synthVec100m(id, d, groups).toSeq))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .repartition(4).cache()
  }

  test("clustered-fixture layout is balanced: no mega-list, few empties") {
    val tl = Ivf.trainTwoLevel(corpus, k1, k2, maxIter = 8)
    val sizes = Ivf.assignTwoLevelBulk(corpus, tl)
      .groupBy("centroid_id").count()
      .collect().map(_.getLong(1))
    val nonEmpty = sizes.length
    val mean = n.toDouble / (k1 * k2)
    val median = sizes.sorted.apply(sizes.length / 2)
    assert(nonEmpty >= (k1 * k2 * 8) / 10,
      s"only $nonEmpty/${k1 * k2} lists non-empty — layout collapsing")
    // the broken layout read max/mean ≈ 4600 and MEDIAN 1 — an order of
    // magnitude of benign skew is fine (few groups per list quantize
    // unevenly at this small geometry), three orders is a collapse
    assert(sizes.max <= 20 * mean,
      s"hot list ${sizes.max} rows vs mean $mean — layout collapsing")
    assert(median >= mean / 10,
      s"median list $median rows vs mean $mean — mass concentrating")
  }

  test("pruned probing (nprobe = nlist/8) keeps recall@10 >= 0.9 vs exact") {
    val tl = Ivf.trainTwoLevel(corpus, k1, k2, maxIter = 8)
    val assigned = Ivf.assignTwoLevelBulk(corpus, tl).cache()
    val flat = tl.flatCentroids(spark)
    // out-of-corpus queries from the same group structure (the 100M
    // bench's query shape)
    val qs = spark.createDataFrame((0 until 20).map { i =>
      val qid = n.toLong + i
      (qid, graft.Bench.synthVec100m(qid, d, groups).toSeq)
    }).toDF("query_id", "qv")
    val nprobe = (k1 * k2) / 8
    val pruned = Ivf.search(assigned, qs, flat, "ip", 10, nprobe)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.Knn.exactBatch(qs, corpus, "ip", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      want.intersect(pruned.getOrElse(qid, Set.empty)).size.toDouble /
        want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"two-level pruned recall@10 at nprobe=$nprobe/${k1 * k2}: " +
      f"$recall%.4f")
    assert(recall >= 0.9, f"pruned recall $recall%.4f < 0.9 floor")
  }
}

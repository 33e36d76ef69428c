package graft.index

import org.apache.spark.sql.functions._

import graft.{Graft, GraftConfig, SparkSpec}
import graft.segments.Segments

/** Layout-balance gate on the SINGLE-LEVEL trainer path (r8 verdict
  * item: the clustered-corpus k-means degeneracy was caught and fixed
  * in `trainTwoLevel`, but `Ivf.trainKMeans` behind the facade's
  * ingest/`rebuild()` could still ship a collapsed layout silently).
  * Three gates:
  *
  *  1. the collapse DETECTOR fires on a hand-built degenerate layout
  *     and stays quiet on a healthy one (pure-function unit test);
  *  2. `trainCentroidsBalanced` returns a balanced layout on the 100M
  *     fixture's own clustered generator, whichever branch fired;
  *  3. the same fixture driven through the real `Graft.rebuild()`
  *     lands a balanced store layout on disk.
  */
class BalanceGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = 768
  private val groups = 48L
  private val n = 1200

  private def vec(id: Long): Array[Double] =
    graft.Bench.synthVec100m(id, d, groups).map(_.toDouble)

  private lazy val corpus = {
    val rows = (0L until n.toLong).map(id => (id, vec(id).toSeq))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .repartition(4).cache()
  }

  private def balanced(sizes: Array[Long], nlist: Int,
      total: Long): Unit = {
    val mean = total.toDouble / nlist
    val median = sizes.sorted.apply(sizes.length / 2)
    assert(sizes.length >= (nlist * 8) / 10,
      s"only ${sizes.length}/$nlist lists non-empty")
    assert(sizes.max <= 20 * mean, s"hot list ${sizes.max} vs mean $mean")
    assert(median >= mean / 10, s"median $median vs mean $mean")
  }

  test("collapse detector: degenerate layout fires, healthy layout does not") {
    val sample = (0L until 600L).map(vec).toArray
    // degenerate: one real center (the global mean) + copies pushed far
    // away — every row lands on center 0, the r8 100M failure shape
    val mean = Array.tabulate(d)(i => sample.map(_(i)).sum / sample.length)
    val far = Array.tabulate(15)(j =>
      Array.tabulate(d)(i => mean(i) + 1000.0 * (j + 1)))
    assert(Ivf.layoutCollapsed(mean +: far, sample),
      "one-mega-list layout must be flagged")
    // healthy: the deterministic farthest-point Lloyd on the same data
    val good = Ivf.lloyd(sample, 16, maxIter = 8)
    assert(!Ivf.layoutCollapsed(good, sample),
      "farthest-point Lloyd layout must pass the audit")
  }

  test("trainCentroidsBalanced yields a balanced layout on the clustered fixture") {
    val nlist = 12
    val cents = Ivf.trainCentroidsBalanced(corpus, n.toLong, nlist)
    assert(cents.count() === nlist.toLong)
    val sizes = Ivf.assign(corpus, cents)
      .groupBy("centroid_id").count().collect().map(_.getLong(1))
    balanced(sizes, nlist, n.toLong)
  }

  test("Graft.rebuild() on the clustered fixture lands a balanced store layout") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-balance-").toString
    val cfg = GraftConfig.default.copy(
      delta = GraftConfig.default.delta.copy(nlist = 12, nprobe = 4))
    val g = Graft.open(spark, base, cfg)
    val batch = (0L until n.toLong)
      .map(id => (s"id-$id", vec(id).toSeq)).toDF("id", "vec")
    g.upsert(batch)
    assert(g.rebuild().nonEmpty)
    val sizes = Segments.readSegments(spark, base)
      .groupBy("centroid_id").count().collect()
      .filter(_.getLong(0) >= 0).map(_.getLong(1))
    balanced(sizes, nlist = 12, total = n.toLong)
    g.close()
    Segments.deleteDir(base)
  }
}

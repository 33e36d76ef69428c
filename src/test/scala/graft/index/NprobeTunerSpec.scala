package graft.index

import graft.SparkSpec
import graft.operators.Knn

class NprobeTunerSpec extends SparkSpec {

  test("recall is monotonically non-decreasing in nprobe and hits 1.0 at nlist") {
    val cents = Ivf.deterministicCentroids(emb, 50) // 10 centroids at sf0.001
    val qs = Knn.defaultQueries(emb)
    val swept = NprobeTuner.sweep(spark, emb, qs, cents, "ip", 10,
      Seq(1, 2, 4, 10))
    val rows = swept.orderBy("nprobe").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(rows.map(_._2).sliding(2).forall(w => w(0) <= w(1)), rows.toSeq)
    assert(rows.last._2 === 1.0) // probing every list IS the exact search
  }

  test("pick returns smallest nprobe meeting target, clamps otherwise") {
    val cents = Ivf.deterministicCentroids(emb, 50)
    val qs = Knn.defaultQueries(emb)
    val swept = NprobeTuner.sweep(spark, emb, qs, cents, "ip", 10,
      Seq(1, 2, 4, 10)).cache()
    val picked = NprobeTuner.pick(swept, target = 0.9)
    assert(picked >= 1 && picked <= 10)
    assert(NprobeTuner.pick(swept, target = 2.0) === 10) // unreachable → clamp
  }
}

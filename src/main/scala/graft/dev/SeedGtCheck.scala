package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev check for the ground-truth seeding path: with the store-side
  * `groundtruth.tsv` absent and the tracked repo copy present,
  * [[graft.Bench.groundTruth100m]] must seed from the tracked copy
  * (no exact pass) and return the same truth the serving gate uses.
  * Run with the store-side file moved away; prints `SEEDED_OK` and the
  * query count on success.
  */
object SeedGtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir100 = sys.env.getOrElse("GRAFT_100M_DIR",
      "/root/repo/bench_store/ivf100m")
    val n100 = 100000000L
    val d = 768
    // the canonical GT query set: the first GtQueryCount out-of-corpus
    // ids, shared with the bench's recall gate via one constant (the
    // query-id list is part of the gtHeader stamp — drift here would
    // make the seed path silently stop firing)
    val qs = Array.tabulate(graft.Bench.GtQueryCount)(i =>
      (n100 + i, graft.Bench.synthVec100m(n100 + i, d)))
    val extras = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val gt = graft.Bench.groundTruth100m(spark, 4, dir100, n100, d,
      qs, extras)
    require(gt.size == qs.length, s"expected ${qs.length} queries, got ${gt.size}")
    require(gt.values.forall(_.length == 10), "each truth must be top-10")
    require(!extras.contains("ivf_100m_groundtruth_sec"),
      "exact pass ran — the seed path did NOT fire")
    println(s"SEEDED_OK queries=${gt.size}")
    spark.stop()
  }
}

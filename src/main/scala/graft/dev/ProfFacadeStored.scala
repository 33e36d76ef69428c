package graft.dev

import org.apache.spark.sql.SparkSession

import graft.{Bench, Graft, GraftConfig}

/** Dev profiler for the facade's STORED door over the persisted 1M
  * store (`bench_store/facade1m`, built by the bench's facade-warm
  * section): starved stamp-matched re-warm (no L0), evict L1, time N
  * searchPq requests through the broadcast-LUT stored plan + exact
  * phase-2 rerank. Adjudicates the point-lookup listing cache — the
  * pre-cache record measured p50 ~11.6 s/request, dominated by the
  * per-request 3960-directory relisting inside phase 2.
  */
object ProfFacadeStored {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.driver.maxResultSize", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = sys.env.getOrElse("GRAFT_FACADE1M_DIR",
      "/root/repo/bench_store/facade1m")
    val n = sys.env.getOrElse("GRAFT_FACADE1M_ROWS", "1000000").toLong
    val d = 768
    val cfg0 = GraftConfig.default
    val cfg = cfg0.copy(
      collection = cfg0.collection.copy(dim = d, metric = "ip"),
      stable = cfg0.stable.copy(pqM = 96))
    val g = Graft.open(spark, base, cfg)
    try {
      val t0 = System.nanoTime()
      g.warmPqTier(localBudgetBytes = 0L)
      println(f"warm_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      g.releasePqDistTier()
      val qv = Bench.synthVec100m(n + 7, d)
      require(g.searchPq(qv, 10).nonEmpty)
      val lat = (0 until 10).map { i =>
        val q2 = Bench.synthVec100m(n + 13 + i, d)
        val t1 = System.nanoTime()
        require(g.searchPq(q2, 10).nonEmpty)
        (System.nanoTime() - t1) / 1e6
      }.sorted
      println(f"stored_p50_ms=${lat(lat.length / 2)}%.1f")
      println(f"stored_max_ms=${lat.last}%.1f")
      println(s"stored_serves=${g.pqDoorRoutes._3}")
    } finally g.close()
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession

import graft.{Bench, Graft, GraftConfig}

/** Dev decomposition of the restart-adoption path over the persisted
  * 1M facade store (expects a stamped pqcodes_g* left by a prior warm,
  * e.g. the bench's facade-warm section): what does open-with-adoption
  * cost, and what does the FIRST stored serve pay on top — the two
  * once-per-restart numbers behind facade_reopen_first_serve_ms.
  */
object ProfReopen {
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
    def ms[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }
    val g = ms("open_with_adoption")(Graft.open(spark, base, cfg))
    try {
      println(s"adopted=${g.pqCodesLiveDir.isDefined}")
      val qv = Bench.synthVec100m(n + 7, d)
      ms("first_serve")(require(g.searchPq(qv, 10).nonEmpty))
      (0 until 5).foreach { i =>
        val q2 = Bench.synthVec100m(n + 13 + i, d)
        ms(s"steady_serve_$i")(require(g.searchPq(q2, 10).nonEmpty))
      }
      println(s"routes=${g.pqDoorRoutes}")
    } finally g.close()
    spark.stop()
  }
}

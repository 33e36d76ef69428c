package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Bench, Graft, GraftConfig}
import graft.segments.Segments

/** Dev breakdown of the facade stored door's per-request cost over
  * `bench_store/facade1m`: bloom-cache warm time, phase-1 stored ADC
  * exec, phase-2 point-lookup scan (bloom-pruned), and the full door —
  * so the remaining fixed cost has a named owner instead of a guess.
  */
object ProfStoredBreakdown {
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
      def ms[T](tag: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
        r
      }
      val t0 = System.nanoTime()
      g.warmPqTier(localBudgetBytes = 0L)
      println(f"warm_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      ms("bloom_warm_again")(Segments.warmIdBlooms(spark, base))
      g.releasePqDistTier()
      val qv = Bench.synthVec100m(n + 7, d)
      // phase-1 only: the stored ADC plan, executed
      (0 until 3).foreach { i =>
        val q2 = Bench.synthVec100m(n + 13 + i, d)
        ms(s"phase1_stored_$i") {
          val p = g.pqStoredPlanForTest(q2, 40,
            cfg.stable.nprobe, "ip").get
          p.collect().length
        }
      }
      // phase-2 only: candidate hashes from a real phase-1 pool
      val cand = {
        val p = g.pqStoredPlanForTest(qv, 40, cfg.stable.nprobe, "ip").get
        p.collect().map(_.getLong(0)).toIndexedSeq
      }
      println(s"candidates=${cand.length}")
      (0 until 3).foreach { i =>
        ms(s"phase2_lookup_$i") {
          Segments.scanForIdHashes(spark, base, cand).map { df =>
            graft.operators.Lww.latestBy(df, "id_hash", "epoch")
              .filter(!col("deleted") && col("vec").isNotNull)
              .count()
          }
        }
      }
      // pruned file count evidence
      val paths = Segments.catalogDescriptors(spark, base).map(_.file_path)
      val all = Segments.readPaths(spark, paths).inputFiles.toIndexedSeq
      val m = Segments.bloomPruneFiles(spark, all, cand)
      println(s"files_total=${all.length} files_matched=${m.map(_.length)}")
      // the full door
      (0 until 6).foreach { i =>
        val q2 = Bench.synthVec100m(n + 31 + i, d)
        ms(s"full_searchPq_$i")(g.searchPq(q2, 10).length)
      }
    } finally g.close()
    spark.stop()
  }
}

package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the stored-layout IVF search path. */
object ProfStored {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    t("warm tree")(SparkEntry.warmStoredTree(spark, sfDir))
    (0 until 2).foreach { round =>
      println(s"== round $round ==")
      val e = Tables.load(spark, sfDir, "embeddings")
      val q = t("queries df")(graft.operators.Knn.defaultQueries(e))
      val cents = graft.index.Ivf.deterministicCentroids(e, 50)
      val base = t("segtree get")(SparkEntry.storedTreePath(spark, sfDir))
      import graft.segments.Segments
      val probeSet = graft.index.Ivf.probes(q, cents, 3)
      val probedCids = t("probes collect")(
        probeSet.select("centroid_id").distinct().collect().map(_.getLong(0)))
      val all = t("readSegments")(Segments.readSegments(spark, base))
      val latestLive = graft.operators.Lww.latestBy(
          all.select(col("id_hash"), col("epoch"), col("deleted")),
          "id_hash", "epoch")
        .filter(!col("deleted"))
        .select(col("id_hash"), col("epoch"))
      t("latestLive count")(latestLive.count())
      val scored = all
        .filter(col("centroid_id").isin(probedCids.toIndexedSeq: _*))
        .join(latestLive, Seq("id_hash", "epoch"))
        .join(broadcast(probeSet), Seq("centroid_id"))
        .select(col("query_id"), col("vec_id"),
          graft.operators.Knn.score("ip", col("qv"), col("vec")).as("score"))
      t("scored+topk count")(
        graft.operators.Knn.topK(scored, "ip", 10, "vec_id").count())
      (0 until 4).foreach { i =>
        t(s"full searchStored #$i")(graft.index.Ivf.searchStored(
          spark, base, q, cents, "ip", 10, nprobe = 3).count())
      }
    }
    spark.stop()
  }
}

package graft
package dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import graft.segments.Segments
    import graft.ingest.MutationLog
    import graft.index.Ivf
    import graft.functions.VectorFunctions.hashId
    t("warmup")(SparkEntry.queries("dedup_exact")(spark, sfDir).count())
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = Ivf.deterministicCentroids(e, 50)
    val log = MutationLog.deterministicLog(e)
    val rows = Ivf.assign(
        log.withColumn("id_hash", hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("vec_id", "id_hash", "epoch", "deleted", "centroid_id", "vec")
      .cache()
    t("assign+cache count")(rows.count())
    val base = java.nio.file.Files.createTempDirectory("graft-prof-seg-").toString
    t("write 3 deltas (parallel)") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Seq(
        ("delta-000", col("epoch") < 2000),
        ("delta-001", col("epoch") >= 2000 && col("epoch") < 3000),
        ("delta-002", col("epoch") >= 3000)
      ).map { case (seg, pred) => Future {
        Segments.writeSegment(rows.filter(pred), base, seg, isStable = false, expectedNdvPerFile = 2048L)
      }}.foreach(Await.result(_, Duration.Inf))
    }
    // breakdown of the compact cycle
    t("  catalog list")(Segments.catalogDescriptors(spark, base))
    val deltaPaths = Segments.catalogDescriptors(spark, base)
      .filter(!_.is_stable).map(_.file_path)
    val un = t("  read+union deltas")(
      deltaPaths.map(p => spark.read.parquet(p)).reduce(_ unionByName _))
    t("  count deltas")(un.count())
    val cols2 = un.columns
    val resolved = un.groupBy(col("id_hash"))
      .agg(max_by(struct(cols2.toIndexedSeq.map(col): _*), col("epoch")).as("m"))
      .select(col("m.*")).filter(!col("deleted"))
    t("  resolve count")(resolved.count())
    t("  writeSegment stable")(Segments.writeSegment(resolved, base, "stable-pre", isStable = true, expectedNdvPerFile = 2048L))
    t("compact")(Segments.compact(spark, base, "stable-000"))
    t("read stable + count")(Segments.readSegments(spark, base, stableOnly = Some(true)).count())
    Segments.deleteDir(base)
    spark.stop()
  }
}

package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ingest/compaction write path: times each stage
  * of the Bench ingest phase separately so optimization targets the real
  * hotspot instead of a guess.
  */
object ProfileFlush {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.segments.Segments
    import graft.streaming.IngestPipeline

    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.index.Ivf.deterministicCentroids(e, 50)
    val base0 = graft.ingest.MutationLog.deterministicLog(e)
    val n0 = base0.count()
    val reps = math.max(1L, 1000000L / math.max(1L, n0)).toInt
    val replicated = base0
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(col("op"),
        (col("vec_id") + col("rep").cast("long") * lit(1000000L)).as("vec_id"),
        concat(col("id"), lit("-"), col("rep")).as("id"),
        (col("epoch") + col("rep").cast("long") * lit(10000L)).as("epoch"),
        col("vec"))
    val log = graft.index.Ivf.assign(
        replicated
          .withColumn("id_hash",
            graft.functions.VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("op", "vec_id", "id", "id_hash", "epoch", "deleted",
        "centroid_id", "vec")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prof-ingest-").toString
    val src = s"$tmp/src"; val tree = s"$tmp/tree"; val ckpt = s"$tmp/ckpt"
    t("setup: write source")(log.repartition(8).write.parquet(src))
    val nOps = spark.read.parquet(src).count()
    println(s"[prof] nOps = $nOps")

    // whole pipeline, as Bench times it
    val tAll0 = System.nanoTime()
    t("runOnce total")(IngestPipeline.runOnce(spark, src, tree, ckpt))
    val ingSec = (System.nanoTime() - tAll0) / 1e9
    println(f"[prof] ingest ops/s = ${nOps / ingSec}%.1f")

    // now the same batch flushed directly, stage by stage
    val batch = spark.read.parquet(src)
    t("batch.isEmpty")(batch.isEmpty)
    val cols = batch.columns
    val deduped = batch
      .groupBy(col("id_hash"))
      .agg(max_by(struct(cols.toIndexedSeq.map(col): _*), col("epoch")).as("m"))
      .select(col("m.*"))
      .cache()
    t("dedupe+cache+count")(deduped.count())
    t("writeSegment (cached in)")(
      Segments.writeSegment(deduped, s"$tmp/tree2", "delta-x",
        isStable = false))
    deduped.unpersist()
    // single-pass variant: no cache, dedupe flows straight into the write
    val deduped2 = batch
      .groupBy(col("id_hash"))
      .agg(max_by(struct(cols.toIndexedSeq.map(col): _*), col("epoch")).as("m"))
      .select(col("m.*"))
    t("writeSegment (single pass)")(
      Segments.writeSegment(deduped2, s"$tmp/tree3", "delta-y",
        isStable = false))

    // join-based LWW: narrow codegen hash-agg for max epoch, then a
    // shuffled-hash join back — no sort of wide rows anywhere
    val latest = batch.groupBy(col("id_hash")).agg(max(col("epoch")).as("epoch"))
    val dedupJ = batch.join(latest.hint("shuffle_hash"), Seq("id_hash", "epoch"))
    t("dedupe-join count")(dedupJ.count())
    t("writeSegment (join path)")(
      Segments.writeSegment(dedupJ, s"$tmp/tree4", "delta-z",
        isStable = false))
    println("[prof] join plan: " + dedupJ.queryExecution.executedPlan
      .toString.linesIterator.filter(l => l.contains("Join") || l.contains("Aggregate") || l.contains("Sort")).mkString(" | "))
    t("compact")(Segments.compact(spark, tree, "stable-000"))
    Segments.deleteDir(tmp)
    spark.stop()
  }
}

package graft.segments

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.ingest.VectorEntries
import graft.streaming.IngestPipeline

class TagStatsFlushSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("tag stats prune segments before scan (Q5/B4)") {
    val base = tmp("graft-tagstats-")
    val vecs = VectorEntries.fromEmbeddings(emb)
      .withColumn("epoch", col("vec_id"))
      .withColumn("centroid_id", lit(0L))
    // segment A: labels 0-4 only; segment B: labels 5-9 only
    val a = vecs.filter(col("label") < 5)
    val b = vecs.filter(col("label") >= 5)
    Segments.writeSegment(a, base, "segA", isStable = false)
    Segments.writeTagStats(a, base, "segA")
    Segments.writeSegment(b, base, "segB", isStable = false)
    Segments.writeTagStats(b, base, "segB")

    // tag 2 (a label < 5) must prune segB entirely
    assert(Segments.segmentsForTags(spark, base, Seq(2)) === Seq("segA"))
    val hits = Segments.scanForTags(spark, base, Seq(2))
    assert(hits.count() > 0)
    assert(hits.filter(!array_contains(col("tags"), 2)).count() === 0)
    // a tag in both halves reads both
    assert(Segments.segmentsForTags(spark, base, Seq(12)).toSet
      === Set("segA", "segB"))
    Segments.deleteDir(base)
  }

  test("flush policy splits oversized batches into range segments (W10)") {
    val base = tmp("graft-flushpolicy-")
    val rows = VectorEntries.fromEmbeddings(emb)
      .withColumn("epoch", col("vec_id"))
      .withColumn("deleted", lit(false))
      .withColumn("centroid_id", lit(0L))
    IngestPipeline.flushBatch(rows, base, 7L, maxRowsPerSegment = 200L)
    val cat = Segments.catalog(spark, base)
      .select("segment_id", "num_vectors")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(cat.length === 3, cat.mkString(",")) // 500 rows / 200 cap
    assert(cat.map(_._2).sum === 500)
    assert(cat.forall(_._2 <= 250)) // roughly even pmod split
    // replay keeps the same segment names (idempotence preserved)
    IngestPipeline.flushBatch(rows, base, 7L, maxRowsPerSegment = 200L)
    assert(Segments.catalog(spark, base).count() === 3)
    Segments.deleteDir(base)
  }
}

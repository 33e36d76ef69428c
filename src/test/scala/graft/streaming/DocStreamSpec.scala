package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.segments.Segments

class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("streaming exact dedup: first-seen wins across batches and restarts") {
    val src = tmp("graft-docstream-src-")
    val out = tmp("graft-docstream-out-")
    val ckpt = tmp("graft-docstream-ckpt-")
    def docsDF(rows: (Long, String)*) = rows.toSeq
      .map { case (id, t) => (id, t, "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")

    // batch 1: two distinct docs + an in-batch duplicate
    docsDF((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    // batch 2: cross-batch duplicate of doc 1 + a new doc
    docsDF((4L, "alpha beta"), (5L, "epsilon zeta"))
      .coalesce(1).write.mode("append").parquet(src)
    DocStream.runOnce(spark, src, out, ckpt, maxFilesPerTrigger = Some(1))

    val flushed = DocStream.readOutput(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // one survivor per distinct text; doc 3 and doc 4 deduped away
    assert(flushed.map(_._2).distinct.length === flushed.length)
    assert(flushed.map(_._2).sorted.toSeq
      === Seq("alpha beta", "epsilon zeta", "gamma delta"))
    assert(!flushed.map(_._1).contains(3L))
    assert(!flushed.map(_._1).contains(4L))

    // restart: a third wave with an old duplicate and a new doc — state
    // survives the checkpoint, the old text stays deduped
    docsDF((6L, "gamma delta"), (7L, "eta theta"))
      .coalesce(1).write.mode("append").parquet(src)
    DocStream.runOnce(spark, src, out, ckpt)
    val after = DocStream.readOutput(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(after.map(_._2).sorted.toSeq
      === Seq("alpha beta", "epsilon zeta", "eta theta", "gamma delta"))
    assert(!after.map(_._1).contains(6L))

    // hash parity with the batch dedup authority
    val batchHashes = DocStream.withContentHash(
        docsDF((1L, "alpha beta")))
      .select("content_hash").as[String].head()
    assert(DocStream.readOutput(spark, out)
      .filter(col("text") === "alpha beta")
      .select("content_hash").as[String].head() === batchHashes)

    Seq(src, out, ckpt).foreach(Segments.deleteDir)
  }
}

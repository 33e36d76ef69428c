package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorEntriesSpec extends SparkSpec {

  test("Q2 tenant/ns filter is partition pruning on the tenant layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tenant-").toString
    VectorEntries.writeTenantLayout(VectorEntries.fromEmbeddings(emb), dir)
    val one = spark.read.parquet(dir)
      .filter(col("tenant") === "t1" && col("namespace_id") === "ns0")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tenant"),
      plan.take(2000))
    // exactly the (vec_id % 3 == 1 && vec_id % 2 == 0) slice, nothing else
    val expect = emb.filter(col("vec_id") % 3 === 1 && col("vec_id") % 2 === 0)
      .count()
    assert(one.count() === expect && expect > 0)
    // and only the matching directories exist on disk to be listed
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(dirs === Seq("tenant=t0", "tenant=t1", "tenant=t2"))
    graft.segments.Segments.deleteDir(dir)
  }
}

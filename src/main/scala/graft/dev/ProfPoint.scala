package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.Ivf

/** Scratch profiler for single-request KNN latency (dev harness, not part
  * of the bench contract): reproduces the bench's 1M-vector corpus, then
  * breaks a searchPoint request into plan-build vs execute and compares
  * against the batch path with one query.
  */
object ProfPoint {
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
    val e = Tables.load(spark, sfDir, "embeddings")
    val n0 = e.count()
    val reps = math.max(1L, 1000000L / math.max(1L, n0)).toInt
    val big = e
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("vec_id") * lit(reps.toLong) + col("rep")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + col("rep").cast("float") * 1e-6f)
            .otherwise(x)).as("embedding"))
      .repartition(32)
      .cache()
    big.count()
    val nlist = 64
    val cents = Ivf.deterministicCentroids(e, (n0 / nlist).toInt.max(1))
    // cluster the cache by centroid_id: in-memory batch min/max stats then
    // prune unprobed lists (the in-memory analogue of the stored layout's
    // partition pruning)
    val assigned = Ivf.assign(big, cents)
      .repartition(col("centroid_id"))
      .sortWithinPartitions("centroid_id")
      .cache()
    assigned.count()
    val cmat = Ivf.collectCentroids(cents)
    val qs = graft.operators.Knn.defaultQueries(e).collect()
      .map(_.getSeq[Float](1).toArray)

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // warm
    Ivf.searchPoint(assigned, qs.head, cmat, "ip", 10, nprobe = 8).collect()

    (0 until 6).foreach { i =>
      val qv = qs(i % qs.length)
      var t0 = System.nanoTime()
      val df = Ivf.searchPoint(assigned, qv, cmat, "ip", 10, nprobe = 8)
      val tBuild = ms(t0)
      t0 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = ms(t0)
      t0 = System.nanoTime()
      df.collect()
      val tExec = ms(t0)
      println(f"req $i%2d: build=$tBuild%8.1f plan=$tPlan%8.1f exec=$tExec%8.1f ms")
    }
    // dispatch floor: an empty 32-task job — the fixed cost any request
    // pays in local mode regardless of operator design
    (0 until 3).foreach { i =>
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(0 until 32, 32).map(_ => 1).count()
      println(f"noop $i: ${ms(t0)}%8.1f ms")
    }
    // AQE off: adaptive re-planning adds a stage round-trip a lone request
    // can't amortize (measured ~2x on this path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (0 until 10).foreach { i =>
      val qv = qs(i % qs.length)
      val t0 = System.nanoTime()
      Ivf.searchPoint(assigned, qv, cmat, "ip", 10, nprobe = 8).collect()
      println(f"noaqe $i: total=${ms(t0)}%8.1f ms")
    }
    // short-lineage serve cache: parquet roundtrip erases the build
    // lineage (explode/assign/sort) so per-request analysis is a trivial
    // FileScan tree; cache stays columnar with batch stats
    val tmp = java.nio.file.Files.createTempDirectory("profpoint-").toString
    assigned.write.parquet(s"$tmp/serve")
    val serve2 = spark.read.parquet(s"$tmp/serve").cache()
    serve2.count()
    assigned.unpersist()
    Ivf.searchPoint(serve2, qs.head, cmat, "ip", 10, nprobe = 8).collect()
    val lat2 = (0 until 30).map { i =>
      val qv = qs(i % qs.length)
      val t0 = System.nanoTime()
      Ivf.searchPoint(serve2, qv, cmat, "ip", 10, nprobe = 8).collect()
      ms(t0)
    }.sorted
    println(f"shortlineage: p50=${lat2(15)}%8.1f p90=${lat2(27)}%8.1f max=${lat2(29)}%8.1f ms")
    graft.segments.Segments.deleteDir(tmp)
    println("--- plan ---")
    Ivf.searchPoint(assigned, qs.head, cmat, "ip", 10, nprobe = 8)
      .explain("formatted")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":..,"value":..,"queries":{..},"sf":..}.
  * Failures are recorded per query (value -1) instead of being silently
  * timed — a failing query must never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures += name
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f",
        java.lang.Double.valueOf(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    // BASELINE.md recall target (0.95, types.h:140): calibrate nprobe
    // offline (Q13) and report the achieved recall at the picked setting.
    val (tunedNprobe, tunedRecall) =
      try {
        val e = Tables.load(spark, sfDir, "embeddings")
        val cents = graft.index.Ivf.deterministicCentroids(e, 50)
        val nlist = cents.count().toInt
        val cands = Seq(1, 2, 4, 8, 16, nlist).filter(_ <= nlist).distinct
        val swept = graft.index.NprobeTuner.sweep(spark, e,
          graft.operators.Knn.defaultQueries(e), cents, "ip", 10, cands)
          .cache()
        val np = graft.index.NprobeTuner.pick(swept, 0.95)
        val r = swept.filter(org.apache.spark.sql.functions.col("nprobe") === np)
          .select("recall").head().getDouble(0)
        (np, r)
      } catch { case _: Throwable => (-1, -1.0) }
    // each knn_* wall time covers the whole query BATCH (20 queries at
    // sf0.01, 80 at sf0.1, reference max 100/request); the per-query
    // amortized latency is what compares against BASELINE.md's 150 ms p99
    val nQueries =
      try graft.operators.Knn.defaultQueries(
        Tables.load(spark, sfDir, "embeddings")).count()
      catch { case _: Throwable => -1L }
    val perQueryMs = results.toMap.get("knn_exact_ip")
      .filter(_ > 0).map(w => w * 1000.0 / math.max(1L, nQueries))
      .getOrElse(-1.0)
    // exit 0 even with failures: the JSON line (with its "failed" list) is
    // the contract — a non-zero rc would discard the whole measurement
    println(s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,"failed":$failed,"recall_at_tuned_nprobe":${num(tunedRecall, 4)},"tuned_nprobe":$tunedNprobe,"n_queries_per_batch":$nQueries,"knn_exact_per_query_ms":${num(perQueryMs, 2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}

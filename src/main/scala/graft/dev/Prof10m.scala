package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.Ivf

/** Dev harness: the bench's 10M plain-probe section in ISOLATION — the
  * PLANS.md A/B instrument for the r7 `ivf_10m_query` drift (p50
  * 9.2→33.2 / steady p99 10.7→46.1 while the adjacent 10M filtered and
  * overlay sections stayed flat). A fresh JVM runs ONLY the 10M fixture
  * build + the drifted latency loop, with the same bracketing dispatch
  * floors — if the isolated number lands back at the r6 level with
  * healthy floors, the serving code path is exonerated and the drift
  * adjudicates as box weather that outlasted the floor gate's retries.
  */
object Prof10m {
  private def pctl(s: Seq[Double], p: Int): Double =
    if (s.isEmpty) -1 else s((s.length * p / 100).min(s.length - 1))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def floor(): Double = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(0 until cpus, cpus).map(_ => 1).count()
      (System.nanoTime() - t0) / 1e6
    }.min

    val e = Tables.load(spark, sfDir, "embeddings")
    val n0 = e.count()
    val qRows = graft.operators.Knn.defaultQueries(e)
      .collect().map(_.getSeq[Float](1).toArray)
    val servCents = Ivf.deterministicCentroids(e, (n0 / 1024).toInt.max(1))
    val reps10 = math.max(1L, 10000000L / math.max(1L, n0)).toInt
    val big10 = e
      .withColumn("rep", explode(sequence(lit(0), lit(reps10 - 1))))
      .select((col("vec_id") * lit(reps10.toLong) + col("rep")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + col("rep").cast("float") * 1e-6f)
            .otherwise(x)).as("embedding"))
      .repartition(cpus)
    val assigned10 = Ivf.assign(big10, servCents)
      .withColumn("tenant", concat(lit("t"), col("vec_id") % 3))
      .withColumn("tags", array((col("vec_id") % 7).cast("long"),
        lit(10L) + (col("vec_id") % 5).cast("long")))
    val tB = System.nanoTime()
    val idx10 = graft.index.ServingIndex.build(
      assigned10, servCents, "ip",
      tenantCol = Some("tenant"), tagsCol = Some("tags"),
      limits = graft.index.ServingLimits(maxCandidates = 50000))
    val buildSec = (System.nanoTime() - tB) / 1e9
    System.gc()
    val nprobeServ = 8
    (0 until 4).foreach(_ => idx10.search(qRows.head, 10, nprobeServ))

    // two independent measurement waves, floors bracketing each
    (1 to 2).foreach { wave =>
      val fB = floor()
      val at = (0 until 3).map { _ =>
        qRows.map { qv =>
          val t0 = System.nanoTime()
          idx10.search(qv, 10, nprobeServ)
          (System.nanoTime() - t0) / 1e6
        }
      }
      val fA = floor()
      val raw = at.flatten.sorted
      val steady = qRows.indices.map(i => at.map(_(i)).min).sorted
      println(f"""{"wave":$wave,"floor_before_ms":$fB%.1f,"floor_after_ms":$fA%.1f,"build_sec":$buildSec%.1f,"p50_ms":${pctl(raw, 50)}%.1f,"p99_ms":${pctl(raw, 99)}%.1f,"p99_steady_ms":${pctl(steady, 99)}%.1f}""")
    }
    idx10.unpersist()
    spark.stop()
  }
}

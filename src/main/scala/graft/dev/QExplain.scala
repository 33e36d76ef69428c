package graft
package dev

import org.apache.spark.sql.SparkSession

/** Dev harness: write `.explain("formatted")` for SparkEntry queries to
  * files — the optimization rounds' plan evidence. Usage:
  *   runMain graft.dev.QExplain <sfDir> <outDir> <query> [query...]
  * Writes <outDir>/<query>.txt with the formatted physical plan.
  */
object QExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.maxResultSize", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.warmStoredTree(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[qexplain] warmup FAILED: ${e.getMessage}")
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[qexplain] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}

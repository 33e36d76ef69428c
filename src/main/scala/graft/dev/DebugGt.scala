package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the 100M recall plateau (round 8): for one
  * failing ground-truth query, decompose the miss — are the STORED
  * codes for the true neighbors what re-encoding their regenerated
  * vectors produces, and where does their ADC score rank inside the
  * probed pool?
  */
object DebugGt {
  def main(args: Array[String]): Unit = {
    val dir100 = sys.env.getOrElse("GRAFT_100M_DIR", "/tmp/smoke100m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 768; val m = 96; val dsub = 8
    val qid = 2000005L
    val missing = Seq(539796L, 231724L, 702353L)
    val qv = Bench.synthVec100m(qid, d)

    // stored codebook
    val cbRows = spark.read.parquet(s"$dir100/codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val nCodes = cbRows.map(_._2).max + 1
    val cb = graft.index.Pq.Codebook(m, dsub,
      Array.tabulate(nCodes)(_.toLong),
      Array.tabulate(m) { j =>
        cbRows.filter(_._1 == j).sortBy(_._2).map(_._3)
      })
    def lut(q: Array[Float]): Array[Array[Double]] =
      Array.tabulate(m) { j =>
        val book = cb.codebooks(j); val base = j * dsub
        Array.tabulate(book.length) { c =>
          var s = 0.0; var dd = 0
          while (dd < dsub) { s += q(base + dd).toDouble * book(c)(dd); dd += 1 }
          s
        }
      }
    def encode(v: Array[Float]): Array[Int] =
      Array.tabulate(m) { j =>
        val book = cb.codebooks(j); val base = j * dsub
        var bestC = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          var dist = 0.0; var dd = 0
          while (dd < dsub) {
            val diff = v(base + dd).toDouble - book(c)(dd)
            dist += diff * diff; dd += 1
          }
          if (dist < bestD) { bestD = dist; bestC = c }
          c += 1
        }
        bestC
      }
    def exact(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val l = lut(qv)
    def adcOf(codes: Array[Int]): Double = {
      var s = 0.0; var j = 0
      while (j < m) { s += l(j)(codes(j)); j += 1 }
      s
    }

    // stored codes for the missing ids
    val stored = spark.read.parquet(s"$dir100/codes")
      .filter(col("vec_id").isin(missing: _*))
      .select("vec_id", "codes", "centroid_id")
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[Array[Byte]](1).map(_ & 0xFF),
        r.get(2).toString))
    stored.foreach { case (id, codesStored, cid) =>
      val v = Bench.synthVec100m(id, d)
      val reenc = encode(v)
      val agree = codesStored.zip(reenc).count { case (a, b) => a == b }
      println(f"id=$id list=$cid exact=${exact(qv, v)}%.3f " +
        f"adcStored=${adcOf(codesStored)}%.3f adcReenc=${adcOf(reenc)}%.3f " +
        s"codeAgreement=$agree/$m")
    }
    // pool context: ADC scores across ONE probed list (the id's own)
    val sample = spark.read.parquet(s"$dir100/codes")
      .filter(col("centroid_id") === 293)
      .select("vec_id", "codes").limit(2000).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).map(_ & 0xFF)))
    val adcs = sample.map { case (id, c) => (id, adcOf(c)) }
      .sortBy(-_._2)
    println("list 293 ADC top-5: " + adcs.take(5).map {
      case (id, s) => f"$id:$s%.2f" }.mkString(", "))
    println("list 293 ADC of target 539796: " +
      adcs.find(_._1 == 539796L).map(_._2).getOrElse(-1.0))
    println(f"list 293 rows=${sample.length} " +
      f"adc p50=${adcs(adcs.length / 2)._2}%.2f")
    // exact top-5 in that list for calibration
    val ex = sample.map { case (id, _) =>
      (id, exact(qv, Bench.synthVec100m(id, d))) }.sortBy(-_._2)
    println("list 293 EXACT top-5: " + ex.take(5).map {
      case (id, s) => f"$id:$s%.2f" }.mkString(", "))
    spark.stop()
  }
}

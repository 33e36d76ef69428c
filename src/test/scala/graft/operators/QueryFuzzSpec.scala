package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ingest.VectorEntries

/** Query-input fuzzing (reference test taxonomy: `tests/cpp/fuzz/
  * query-fuzz.cpp` [stub]; SURVEY §5): randomized `QueryRequest`s —
  * metric × k × tenant/namespace equality × tags ANY-of (including
  * never-matching tags) × tombstone sets × k larger than the match set —
  * run through the real engine path (filter + codegen score + heap top-k)
  * and compared EXACTLY (bit-level doubles) against a driver-side brute
  * force over the same rows. Seeded, so failures reproduce.
  */
class QueryFuzzSpec extends SparkSpec {

  private case class Entry(vecId: Long, vec: Array[Float], tenant: String,
      ns: String, tags: Seq[Int])

  // same sequential-index-order double accumulation as the codegen kernels
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    s
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("random filtered KNN requests match driver-side brute force exactly") {
    val entries = VectorEntries.fromEmbeddings(emb).cache()
    val rows = entries
      .select("vec_id", "embedding", "tenant", "namespace_id", "tags")
      .collect().map { r =>
        Entry(r.getLong(0), r.getSeq[Float](1).toArray, r.getString(2),
          r.getString(3), r.getSeq[Int](4))
      }
    assert(rows.length > 50)
    val byId = rows.map(e => e.vecId -> e).toMap
    val allTags = rows.flatMap(_.tags).distinct.toSeq.sorted

    val qvType = ArrayType(FloatType, containsNull = false)
    val qSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("qv", qvType, nullable = false)))

    (1 to 25).foreach { seed =>
      val rnd = new Random(seed)
      val metric = Seq("ip", "l2", "cosine")(rnd.nextInt(3))
      val k = 1 + rnd.nextInt(15)
      val tenantF = if (rnd.nextBoolean()) Some(s"t${rnd.nextInt(3)}") else None
      val nsF = if (rnd.nextInt(3) == 0) Some(s"ns${rnd.nextInt(2)}") else None
      val tagsF =
        if (rnd.nextInt(3) == 0)
          Some(rnd.shuffle(allTags).take(1 + rnd.nextInt(3)) ++
            (if (rnd.nextBoolean()) Seq(999) else Nil))
        else None
      val deleted = rows.filter(_ => rnd.nextInt(10) == 0).map(_.vecId).toSet
      val qIds = rnd.shuffle(rows.toSeq).take(3).map(_.vecId)

      // engine path: the composed QueryRequest filter over the entry view
      var filt: Column = if (deleted.isEmpty) lit(true)
        else !col("vec_id").isin(deleted.toSeq: _*)
      tenantF.foreach(t => filt = filt && col("tenant") === t)
      nsF.foreach(n => filt = filt && col("namespace_id") === n)
      tagsF.foreach(ts => filt = filt && VectorEntries.tagsAny(ts))
      val queries = spark.createDataFrame(
        java.util.Arrays.asList(
          qIds.map(q => Row(q, byId(q).vec.toSeq)): _*), qSchema)
      val got = Knn.exactBatch(queries, entries, metric, k, filter = filt)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1)
        .view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap

      // oracle: plain Scala over the same rows, same arithmetic order
      val surviving = rows.filter(e =>
        !deleted(e.vecId) &&
        tenantF.forall(_ == e.tenant) &&
        nsF.forall(_ == e.ns) &&
        tagsF.forall(ts => e.tags.exists(ts.contains)))
      val asc = Knn.isAscending(metric)
      qIds.foreach { q =>
        val qv = byId(q).vec
        val scored = surviving.map { e =>
          val s = metric match {
            case "ip" => dot(qv, e.vec)
            case "l2" => l2sq(qv, e.vec)
            case "cosine" => cos(qv, e.vec)
          }
          (e.vecId, s)
        }
        val expect = scored.toSeq
          .sortBy { case (id, s) => (if (asc) s else -s, id) }.take(k)
        val gotQ = got.getOrElse(q, Seq.empty)
          .sortBy { case (id, s) => (if (asc) s else -s, id) }
        assert(gotQ === expect,
          s"seed=$seed metric=$metric k=$k tenant=$tenantF ns=$nsF " +
            s"tags=$tagsF deleted=${deleted.size} q=$q")
      }
    }
    entries.unpersist()
  }

  test("random filtered SERVING requests match driver-side brute force exactly") {
    import graft.index.{Ivf, ServingFilter, ServingIndex}
    val entries = VectorEntries.fromEmbeddings(emb)
    val cents = Ivf.deterministicCentroids(emb, 50)
    val assigned = Ivf.assign(entries, cents).cache()
    val rows = assigned
      .select("vec_id", "embedding", "tenant", "tags")
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).toArray, r.getString(2),
          r.getSeq[Int](3).map(_.toLong))
      }
    val byId = rows.map(e => e._1 -> e).toMap
    val allTags = rows.flatMap(_._4).distinct.sorted
    def sampled(id: Long, p: Int): Boolean = {
      val m = (id * 2654435761L) % 100L
      (if (m < 0) m + 100L else m) < p
    }
    for (metric <- Seq("ip", "l2", "cosine")) {
      val idx = ServingIndex.build(assigned, cents, metric,
        tenantCol = Some("tenant"), tagsCol = Some("tags"))
      val local = idx.toLocal() // fuzz the driver-resident tier too
      val asc = Knn.isAscending(metric)
      (1 to 10).foreach { seed =>
        val rnd = new Random(100 * seed)
        val k = 1 + rnd.nextInt(15)
        val tenantF = if (rnd.nextBoolean()) Some(s"t${rnd.nextInt(3)}") else None
        val tagsF =
          if (rnd.nextInt(3) == 0)
            Some((rnd.shuffle(allTags).take(1 + rnd.nextInt(3)) ++
              (if (rnd.nextBoolean()) Seq(999L) else Nil)).toSeq)
          else None
        val sampleF = if (rnd.nextInt(3) == 0) Some(25 * (1 + rnd.nextInt(3))) else None
        val q = rnd.shuffle(rows.toSeq).head
        val got = idx.search(q._2, k, Int.MaxValue,
          ServingFilter(tenantF, tagsF, sampleF)).toSeq
        val surviving = rows.filter { e =>
          tenantF.forall(_ == e._3) &&
          tagsF.forall(ts => e._4.exists(ts.contains)) &&
          sampleF.forall(p => sampled(e._1, p))
        }
        val expect = surviving.map { e =>
          val s = metric match {
            case "ip" => dot(q._2, e._2)
            case "l2" => l2sq(q._2, e._2)
            case "cosine" => cos(q._2, e._2)
          }
          (e._1, s)
        }.toSeq.sortBy { case (id, s) => (if (asc) s else -s, id) }.take(k)
        assert(got === expect,
          s"seed=$seed metric=$metric k=$k tenant=$tenantF tags=$tagsF " +
            s"sample=$sampleF q=${q._1}")
        // the driver-resident tier must agree bit-for-bit on the same
        // random request
        assert(local.search(q._2, k, Int.MaxValue,
            ServingFilter(tenantF, tagsF, sampleF)).toSeq === expect,
          s"LOCAL seed=$seed metric=$metric k=$k q=${q._1}")
      }
      idx.unpersist()
    }
    assigned.unpersist()
  }

  test("exactBatchBulk is bit-identical to the declarative exactBatch") {
    val qs = Knn.defaultQueries(emb)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), col("score"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    for (metric <- Seq("ip", "l2", "l2x", "cosine")) {
      // float source (the embeddings table), with a filter composed
      val a = rows(Knn.exactBatch(qs, emb, metric, 10,
        filter = Knn.sampleFilter(60)))
      val b = rows(Knn.exactBatchBulk(qs, emb, metric, 10,
        filter = Knn.sampleFilter(60)))
      assert(a === b, s"metric=$metric float")
      // double source (segment-style vec columns take this path); also
      // covers a query count not divisible by the 4-way interleave
      val embD = emb.withColumn("embedding",
        col("embedding").cast("array<double>"))
      val qs5 = qs.limit(5)
      val aD = rows(Knn.exactBatch(qs5, embD, metric, 7))
      val bD = rows(Knn.exactBatchBulk(qs5, embD, metric, 7))
      assert(aD === bD, s"metric=$metric double")
    }
  }
}

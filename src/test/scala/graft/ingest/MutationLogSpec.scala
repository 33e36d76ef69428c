package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MutationLogSpec extends SparkSpec {
  import spark.implicits._

  private def log = MutationLog.deterministicLog(emb).cache()

  test("resolveLatestAgg == resolveLatest (window) on the same log") {
    val a = MutationLog.resolveLatestAgg(log)
      .select("id", "op", "epoch").as[(String, String, Long)]
      .collect().sortBy(_._1)
    val w = MutationLog.resolveLatest(log)
      .select("id", "op", "epoch").as[(String, String, Long)]
      .collect().sortBy(_._1)
    assert(a.toSeq === w.toSeq)
  }

  test("LWW resolve is input-order insensitive") {
    val shuffled = log.orderBy(rand(123))
    val a = MutationLog.live(log).select("vec_id", "epoch")
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = MutationLog.live(shuffled).select("vec_id", "epoch")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("live excludes tombstoned ids and keeps upserted versions") {
    val lives = MutationLog.live(log)
    // vec_id % 10 == 0 deleted
    assert(lives.filter(col("vec_id") % 10 === 0).count() === 0)
    // vec_id % 5 == 0 (not deleted) carries the UPSERT epoch 2000+id
    val up = lives.filter(col("vec_id") === 5).select("epoch")
      .as[Long].head()
    assert(up === 2005L)
    // others carry the INSERT epoch
    val ins = lives.filter(col("vec_id") === 1).select("epoch")
      .as[Long].head()
    assert(ins === 1001L)
  }

  test("pointLookup reports liveness and last epoch, -1 for missing") {
    val out = MutationLog.pointLookup(log, Seq(0L, 1L, 5L, 9999L))
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, false, 3000L),    // deleted
      (1L, true, 1001L),     // plain insert
      (5L, true, 2005L),     // upserted
      (9999L, false, -1L)))  // never existed
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("unigramScore: hand-computed frequencies on a toy corpus") {
    // corpus: "a a b" + "b c" → counts a=2 b=2 c=1, total=5
    val d = Seq((1L, "a a b", "en", "s"), (2L, "b c", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.unigramScore(d)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 1: tokens a,a,b → sum 2+2+2=6, avg 6/(3·5)
    assert(got(0) === ((1L, 3L, 6L, 6.0 / 15.0)))
    // doc 2: tokens b,c → sum 2+1=3, avg 3/(2·5)
    assert(got(1) === ((2L, 2L, 3L, 3.0 / 10.0)))
    // common-vocabulary docs score higher than rare-vocabulary docs
    val scores = TextOps.unigramScore(docs)
      .select("avg_freq").as[Double].collect()
    assert(scores.forall(s => s > 0.0 && s <= 1.0))
  }

  test("unigramScore hot/cold split is exact at any hotV boundary") {
    // hotV=2 on a 4-token vocabulary forces BOTH paths live (a,b hot
    // broadcast; c,d cold shuffle) including a count tie at the boundary;
    // the split must be invisible in the values
    val d = Seq((1L, "a a b c", "en", "s"), (2L, "b c d", "en", "s"),
        (3L, "a d", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val whole = TextOps.unigramScore(d, hotV = 1000000)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    for (v <- Seq(0, 1, 2, 3, 4)) {
      val split = TextOps.unigramScore(d, hotV = v)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(split === whole, s"hotV=$v")
    }
    // real corpus, tiny head: still identical
    val a = TextOps.unigramScore(docs, hotV = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = TextOps.unigramScore(docs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("bigramScore: hand-computed transition counts; hot/cold split exact") {
    // docs: "a b a b" → bigrams (a b),(b a),(a b); "a b c" → (a b),(b c)
    // corpus counts: (a b)=3, (b a)=1, (b c)=1, total=5
    val d = Seq((1L, "a b a b", "en", "s"), (2L, "a b c", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val whole = TextOps.bigramScore(d, hotV = 1000000)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc 1: 3+1+3=7 over 3 positions; doc 2: 3+1=4 over 2 positions
    assert(whole === Seq((1L, 3L, 7L, 7.0 / 15.0), (2L, 2L, 4L, 4.0 / 10.0)))
    // split exactness at every boundary incl. the count tie (b a)=(b c)
    for (v <- Seq(0, 1, 2, 3)) {
      val split = TextOps.bigramScore(d, hotV = v)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(split === whole, s"hotV=$v")
    }
    // a single-token doc yields no bigrams and no output row
    val single = Seq((9L, "solo", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(TextOps.bigramScore(single).count() === 0L)
  }

  test("boilerplateNgrams finds cross-doc repeated 5-grams, ranked") {
    val boiler = "all rights reserved click here now"
    val d = Seq(
      (1L, s"alpha beta $boiler gamma", "en", "s"),
      (2L, s"delta $boiler epsilon zeta", "en", "s"),
      (3L, s"unique words only in this doc", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.boilerplateNgrams(d, 5, 10)
      .as[(String, Long, Long)].collect()
    // the shared 6-token run yields two shared 5-grams, each in 2 docs
    assert(got.length === 2)
    assert(got.forall(_._3 === 2L))
    assert(got.map(_._1).contains("all rights reserved click here"))
    assert(got.map(_._1).contains("rights reserved click here now"))
    // short docs (< 5 tokens) don't blow up
    val short = Seq((9L, "too short", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(TextOps.boilerplateNgrams(short).count() === 0)
  }

  test("packSequences: contiguous global offsets across partition boundaries") {
    // 8 partitions over 500 docs forces several partition boundaries —
    // the distributed prefix-sum must stitch them seamlessly
    val got = TextOps.packSequences(docs, budgetTokens = 256,
        numPartitions = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // continuity: each doc starts exactly where the previous one ended
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + a._2, s"gap between doc ${a._1} and ${b._1}")
    }
    assert(got.head._3 === 0L)
    // seq assignment: start / budget
    got.foreach { case (id, _, start, seq) =>
      assert(seq === start / 256, s"doc $id")
    }
    // budget-independent invariant: same starts at a different partition
    // count (the prefix-sum is partitioning-independent)
    val alt = TextOps.packSequences(docs, budgetTokens = 256,
        numPartitions = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(alt.map(r => (r._1, r._3)).toSeq === got.map(r => (r._1, r._3)).toSeq)
  }

  test("contamination flags docs sharing an 8-gram with the benchmark set") {
    val eightGram = "one two three four five six seven eight"
    val d = Seq(
      (1L, s"prefix words $eightGram suffix words here", "en", "s"),
      (2L, "completely unrelated text with no overlap at all whatsoever", "en", "s"),
      (3L, s"another doc that also leaks $eightGram in the middle", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val bench = Seq((100L, s"benchmark question: $eightGram answer", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.contamination(d, bench)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._3)).toSeq
      === Seq((1L, true), (2L, false), (3L, true)))
    assert(got(0)._2 === 1L) // exactly the one shared 8-gram
  }

  test("balancedMix downsamples skewed sources to the smallest, deterministically") {
    val rows = (1 to 200).map(i => (i.toLong, s"doc number $i with words", "en", "big")) ++
      (201 to 220).map(i => (i.toLong, s"doc number $i with words", "en", "small"))
    val d = rows.toDF("doc_id", "text", "lang", "source")
    val kept = TextOps.balancedMix(d).as[(Long, String)].collect()
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // smallest source keeps everything; the big one downsamples toward it
    assert(bySource("small") === 20)
    assert(bySource("big") < 40, s"big kept ${bySource("big")}")
    assert(bySource("big") > 5)
    // content-hash gate → identical keep-set under different partitioning
    val kept2 = TextOps.balancedMix(d.repartition(7)).as[(Long, String)]
      .collect()
    assert(kept2.map(_._1).sorted.toSeq === kept.map(_._1).sorted.toSeq)
  }

  test("piiRedact counts and replaces emails deterministically") {
    val d = Seq(
      (1L, "contact me at alice@example.com or bob.smith+x@sub.domain.org", "en", "s"),
      (2L, "no pii here at all", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.piiRedact(d)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === 2L)
    assert(got(1)._2 === 0L)
    // the redaction hash equals the md5 of the hand-redacted text
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("contact me at <EMAIL> or <EMAIL>".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(0)._3 === expected)
    // untouched text hashes to its own md5 (replacement is a no-op)
    val plain = java.security.MessageDigest.getInstance("MD5")
      .digest("no pii here at all".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(1)._3 === plain)
  }

  test("stratifiedSample: heap-aggregate sample equals the sorted-rank definition") {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"), col("source"))
    val k = 3
    val got = TextOps.stratifiedSample(docs, k)
      .as[(String, Long, Long)].collect().toSet
    // reference semantics: k lowest md5-28bit(doc_id) per source
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
      .cast("long")
    val exp = d.withColumn("hv", hv)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("doc_id"), col("rn").cast("long"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === exp)
    // every source is represented with exactly min(k, source size) rows
    val sizes = d.groupBy("source").count().as[(String, Long)].collect().toMap
    val gotSizes = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(gotSizes === sizes.view.mapValues(math.min(k.toLong, _)).toMap)
    // deterministic under repartitioning
    val shuffled = TextOps.stratifiedSample(docs.repartition(7), k)
      .as[(String, Long, Long)].collect().toSet
    assert(shuffled === got)
  }

  test("curationFunnel: stage counts are monotone and losers are dropped") {
    val pairs = DedupOps.minhashPairsOracle(docs).select($"a", $"b")
    val got = TextOps.curationFunnel(docs, pairs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // sequential gates can only shrink the survivor set
    got.foreach { case (src, n, q, c, k) =>
      assert(n >= q && q >= c && c >= k, s"$src: $n $q $c $k")
    }
    // totals: every doc is counted exactly once across sources
    assert(got.map(_._2).sum === docs.count())
    // the dup gate really fires somewhere (sf0.001 has verified near-dups
    // whose losers pass both row-local gates) — guard against the loser
    // join silently vanishing
    val losersDropped = got.map(r => r._4 - r._5).sum
    val verifiedLosers = pairs.select($"b").distinct().count()
    assert(losersDropped >= 0 && losersDropped <= verifiedLosers)
    if (verifiedLosers > 0) {
      // at least: the funnel with no pairs keeps >= the funnel with pairs
      val noPairs = TextOps.curationFunnel(docs,
          Seq.empty[(Long, Long)].toDF("a", "b"))
        .as[(String, Long, Long, Long, Long)].collect()
      assert(noPairs.map(_._5).sum >= got.map(_._5).sum)
    }
  }
}

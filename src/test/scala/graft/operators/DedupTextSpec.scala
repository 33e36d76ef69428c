package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private val toy = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "s1"),
    (3L, "the quick brown fox leaps over the lazy dog", "en", "s1"),
    (4L, "completely different text about spark engines", "en", "s2"))
    .toDF("doc_id", "text", "lang", "source")

  test("jaccard: identical docs = 1, disjoint docs = 0") {
    val pairs = DedupOps.jaccardPairsWithin(toy, "source", 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
  }

  test("exactGroups collapses exact duplicates to one canonical id") {
    val g = DedupOps.exactGroups(toy).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (n_dups, canonical)
    assert(g.exists { case (n, c) => n == 2 && c == 1L })
    assert(g.length === 3) // 3 distinct texts
  }

  test("minhash oracle pairs find the exact dup with jaccard 1") {
    val pairs = DedupOps.minhashPairsOracle(toy, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("minhash oracle jaccard is exact when shared shingles differ in relative order") {
    // cyclic rotations: identical shingle SETS, but the (distinct,
    // first-occurrence-ordered) shingle arrays differ in order — the
    // merge-intersect verify kernel must still count every shared shingle
    val rot = Seq(
      (1L, "a b c a b c a b c a b", "en", "s1"),
      (2L, "b c a b c a b c a b c", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = DedupOps.minhashPairsOracle(rot, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("simhash oracle: identical docs at hamming 0, different docs apart") {
    val pairs = DedupOps.simhashPairsOracle(toy, maxHamming = 0)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("fingerprint is identical for identical text, differs otherwise") {
    val fp = TextOps.fingerprint(toy).as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(4L))
  }

  test("langId identifies real-language toy docs; word salad → en/und") {
    val multi = Seq(
      (1L, "the cat is on the mat and that is that", "en"),
      (2L, "der hund ist nicht das problem und das ist gut", "de"),
      (3L, "el perro que corre por la casa como los gatos", "es"),
      (4L, "le chien et les chats dans un jardin des fleurs", "fr"),
      (5L, "我 有 一只 猫 它 是 我 的 朋友 在 家 和 我", "zh"),
      (6L, "zxqv wplk mnbv qqee rrtt yyuu", "xx")) // gibberish
      .toDF("doc_id", "text", "lang")
    val out = TextOps.langId(multi)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "es")
    assert(out(4L) === "fr")
    assert(out(5L) === "zh")
    assert(out(6L) === "und")
    // driver docs are English-ish word salad whatever their label says —
    // the classifier must therefore answer en or und, never something else
    val preds = TextOps.langId(docs).select("pred_lang")
      .distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("en", "und")), preds.toString)
  }

  test("minhash production (xxhash64) variant agrees with oracle variant on candidates") {
    val prod = DedupOps.minhashNearDups(docs, threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val oracle = DedupOps.minhashPairsOracle(docs, threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // different hash families: candidate recall differs, but the heavy
    // overlap (true near-dups) must agree
    val inter = (prod & oracle).size.toDouble
    assert(inter / math.max(1, oracle.size) > 0.8,
      s"prod=${prod.size} oracle=${oracle.size} inter=$inter")
  }

  test("dedup_minhash_prod pinned: verified xxhash64 pairs equal the oracle-gated md5 twin's") {
    // the ONE registered query DuckDB cannot gate (xxhash64 has no
    // DuckDB analogue): pin it to the hash-gated md5 twin instead. Both
    // paths verify candidates with the SAME exact shingle Jaccard, so
    // wherever banding recalls the same true pairs the verified outputs
    // must be identical — (a, b, jaccard) triples, not just pair ids.
    // At the registered configuration (threshold 0.5, both defaults)
    // on the shared fixture the two verified sets coincide exactly.
    val prod = DedupOps.minhashNearDups(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val oracle = DedupOps.minhashPairsOracle(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(prod === oracle,
      s"prod-only=${(prod -- oracle).take(5)} " +
        s"oracle-only=${(oracle -- prod).take(5)}")
    assert(prod.nonEmpty, "fixture must contain verified near-dups")
  }

  test("repetitionStats matches hand-computed fractions") {
    val d = Seq((1L, "a a a b", "en", "s1"), (2L, "w x y z", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.repetitionStats(d)
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    // doc 1: 4 tokens {a,a,a,b}; bigrams [aa,aa,ab] -> top 2/3;
    // trigrams [aaa,aab] all unique -> 0/2
    assert(got(0) === ((1L, 4L, 2.0 / 4, 2.0 / 3, 0.0)))
    // doc 2: all distinct
    assert(got(1) === ((2L, 4L, 0.0, 1.0 / 3, 0.0)))
    // short docs don't crash: below k tokens the k-gram fractions are null
    val short = TextOps.repetitionStats(
      Seq((3L, "hi", "en", "s1")).toDF("doc_id", "text", "lang", "source"))
      .collect().head
    assert(short.getLong(1) === 1L)
    assert(short.isNullAt(3) && short.isNullAt(4))
  }

  test("semanticDedup: exact copies dedupe to the lowest id, only within cluster") {
    // two identical vectors (1,2), a same-cluster near-copy (3), and an
    // orthogonal vector (4) that lands in another cluster
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val assigned = vecs.withColumn("centroid_id",
      when(col("vec_id") === 4L, 1L).otherwise(0L))
    val got = DedupOps.semanticDedup(assigned, 0.95)
      .as[(Long, Long)].collect().sortBy(_._1)
    // 2 dupes 1 (cos=1); 3 dupes 1 (cos≈0.994, min cand); 4 alone
    assert(got === Seq((2L, 1L), (3L, 1L)))
    // at an impossible threshold nothing is a duplicate
    assert(DedupOps.semanticDedup(assigned, 1.1).count() === 0)
    // duplicates always resolve to a strictly lower id in the same cluster
    val e = emb.limit(300)
    val asg = graft.index.Ivf.assign(e,
      graft.index.Ivf.deterministicCentroids(e, 50))
    val rows = DedupOps.semanticDedup(asg, 0.2)
      .join(asg.select(col("vec_id"), col("centroid_id")), "vec_id")
      .join(asg.select(col("vec_id").as("canonical_id"),
        col("centroid_id").as("ccid")), "canonical_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (canonical, vid, cid, ccid) =>
      assert(canonical < vid); assert(cid === ccid)
    }
  }

  test("semanticDedup salting: one pathological hot cluster, results independent of maxBlock") {
    // 50% of rows land in one centroid — the hot-cluster case that would
    // otherwise become a single quadratic straggler task
    val e = emb.limit(400)
    val hot = e.withColumn("centroid_id",
      when(col("vec_id") % 2 === 0, 0L).otherwise(col("vec_id") % 7 + 1))
    def run(maxBlock: Int) =
      DedupOps.semanticDedup(hot, 0.2, maxBlock)
        .as[(Long, Long)].collect().toSet
    val unsalted = run(Int.MaxValue) // B = 1 everywhere
    val salted = run(25)             // hot cluster splits into 8 blocks
    assert(salted === unsalted)
    assert(unsalted.nonEmpty)
    // sanity: salting actually engaged (the hot cluster exceeds 25 rows)
    assert(hot.filter(col("centroid_id") === 0L).count() > 25)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    val df = docs.select(
      array_sort(array_distinct(split(lower(col("text")), " "))).as("ta"),
      array_sort(array_distinct(split(lower(reverse(col("text"))), " ")))
        .as("tb"))
    val diff = df.select(
        graft.functions.expr.SketchExpressions
          .sortedIntersectCount(col("ta"), col("tb")).as("fast"),
        size(array_intersect(col("ta"), col("tb"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff === 0L)
    // edge cases: empty vs non-empty, both empty, no overlap
    val edge = Seq(
      (Seq[String](), Seq("a", "b")),
      (Seq[String](), Seq[String]()),
      (Seq("a", "c"), Seq("b", "d")),
      (Seq("a", "b", "c"), Seq("b", "c", "z"))).toDF("ta", "tb")
    val got = edge.select(graft.functions.expr.SketchExpressions
        .sortedIntersectCount(col("ta"), col("tb"))).as[Int].collect().toSeq
    assert(got === Seq(0, 0, 0, 2))
  }

  test("dupSpans: cross-doc and within-doc duplicated windows, merged interval coverage") {
    val d = Seq(
      // docs 1/2 share the 3-token windows "a b c" and "b c d"
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d q r"),
      // fully unique
      (3L, "m n o p s t u v"),
      // within-doc repetition: every window identical → full coverage
      (4L, "z z z z z z z z z z"),
      // two DISJOINT shared spans — exercises the gap in the merge fold
      (5L, "aa bb cc k1 k2 k3 dd ee ff"),
      (6L, "aa bb cc m1 m2 m3 dd ee ff"))
      .toDF("doc_id", "text")
    val out = DedupOps.dupSpans(d, w = 3)
      .select("doc_id", "n_tokens", "n_windows", "dup_windows",
        "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // doc1: dup windows at pos 0,1 → [0,3)∪[1,4) = 4 tokens of 8
    assert(out(1L) === ((1L, 8L, 6L, 2L, 4L, 0.5)))
    assert(out(2L) === ((2L, 8L, 6L, 2L, 4L, 0.5)))
    assert(out(3L) === ((3L, 8L, 6L, 0L, 0L, 0.0)))
    // doc4: all 8 windows are the same hash (count 8 ≥ 2) → covers all 10
    assert(out(4L) === ((4L, 10L, 8L, 8L, 10L, 1.0)))
    // docs 5/6: dup at pos 0 and 6 → [0,3)∪[6,9) = 6 of 9
    assert(out(5L) === ((5L, 9L, 7L, 2L, 6L, 6.0 / 9.0)))
    assert(out(6L) === ((6L, 9L, 7L, 2L, 6L, 6.0 / 9.0)))
    // short doc (< w tokens) → zero windows, present with zeros
    val short = DedupOps.dupSpans(
      Seq((7L, "only two")).toDF("doc_id", "text"), w = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(short.toSeq === Seq((7L, 2L, 0L, 0L, 0L, 0.0)))
  }
}

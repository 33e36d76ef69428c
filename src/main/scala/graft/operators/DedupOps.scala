package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every near-dup variant follows the same blocked shape —
  * (1) map-side signature per doc, (2) explode to (bucket, doc) and
  * self-join on the bucket (shuffle keyed by bucket, never all-pairs),
  * (3) verify candidates exactly. Only [[jaccardPairsWithin]] and
  * [[cosineTopPairs]] do bounded all-pairs inside a small blocking key —
  * those are the oracle-checkable baselines.
  */
object DedupOps {

  private def toks(c: Column): Column = split(lower(c), " ", -1)

  /** Exact dedupe: group by content hash, keep-first canonical doc.
    * At scale: a single hash-aggregate on md5 (map-side combine).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(lower(col("text"))).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_id"))

  /** Word n-gram shingles of a text column (n consecutive tokens joined by
    * a separator), distinct.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = filter(toks(text), x => x =!= "")
    val ngram = transform(
      sequence(lit(0), size(t) - n),
      i => concat_ws("", slice(t, i + 1, lit(n))))
    array_distinct(when(size(t) >= n, ngram).otherwise(array()))
  }

  /** Exact Jaccard of two SORTED DISTINCT string arrays via the merge-pass
    * intersection kernel — same values as [[jaccard]], none of its per-pair
    * hash-set allocation.
    */
  private def jaccardSorted(a: Column, b: Column): Column = {
    val inter = graft.functions.expr.SketchExpressions
      .sortedIntersectCount(a, b).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Exact Jaccard similarity of two string-array columns (distinct sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(array_distinct(a)) + size(array_distinct(b))
      - size(array_intersect(a, b))).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Top-`limit` most-similar doc pairs by distinct-token Jaccard, blocked
    * by a key column (e.g. `source`) — the oracle-checkable baseline.
    * Ties broken (jaccard desc, a asc, b asc).
    */
  def jaccardPairsWithin(docs: DataFrame, blockCol: String,
      limit: Int): DataFrame = {
    // tokens sorted once per doc: the per-pair intersection becomes a
    // zero-allocation merge pass (sorted_intersect_count) instead of an
    // array_intersect hash-set build per pair — same values, ~10x faster
    // on the all-pairs verify
    val sortedToks =
      array_sort(array_distinct(filter(toks(col("text")), x => x =!= "")))
    // tokenize+sort ONCE, in parallel: widen the one-split input first
    // (no-op at real scale), then materialize the expensive per-doc
    // projection so both join sides read it instead of each re-running
    // the interpreted-HOF pass (the broadcast side would otherwise
    // rebuild it single-threaded inside the broadcast job)
    val sorted = Parallelism.widen(docs)
      .select(col(blockCol), col("doc_id"), sortedToks.as("t"))
      .localCheckpoint(true)
    val a = sorted.select(col(blockCol), col("doc_id").as("a"),
      col("t").as("ta"))
    val b = sorted.select(col(blockCol), col("doc_id").as("b"),
      col("t").as("tb"))
    // materialize the intersection size once per pair (a second Project —
    // CollapseProject keeps it because `inter` is referenced twice)
    a.join(b, Seq(blockCol))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        graft.functions.expr.SketchExpressions
          .sortedIntersectCount(col("ta"), col("tb"))
          .cast("double").as("inter"),
        (size(col("ta")) + size(col("tb"))).cast("double").as("tot"))
      .select(col("a"), col("b"),
        when(col("tot") - col("inter") === 0, lit(0.0))
          .otherwise(col("inter") / (col("tot") - col("inter")))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a").asc, col("b").asc)
      .limit(limit)
  }

  /** MinHash signatures over 3-token shingles, entirely in codegen'd
    * built-ins: base hash = xxhash64(shingle), then `numHashes` universal
    * hashes h_i(x) = (a_i·x + b_i) via fixed odd multipliers; signature_i =
    * min over shingles.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64,
      shingleN: Int = 3): DataFrame = {
    val baseHashes = transform(shingles(col("text"), shingleN),
      s => xxhash64(s))
    docs.select(col("doc_id"),
      graft.functions.expr.SketchExpressions
        .minhashSigs(baseHashes, numHashes).as("minhash"))
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band_id, band_hash), verify with exact shingle Jaccard ≥ threshold.
    * The bucket self-join is the only shuffle; all-pairs never materializes.
    */
  def minhashNearDups(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    // shingling is several interpreted HOF passes per doc — materialize
    // once, sorted so the verify step can merge-intersect
    val sh = docs.select(col("doc_id"),
      array_sort(shingles(col("text"), shingleN)).as("sh")).cache()
    val sigs = sh.select(col("doc_id"),
      graft.functions.expr.SketchExpressions.minhashSigs(
        transform(col("sh"), s => xxhash64(s)), numHashes).as("minhash"))
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("minhash"), b * rows + 1, lit(rows)))))
          .as(Seq("band_id", "band_hash")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sa")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        jaccardSorted(col("sa"), col("sb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token xxhash64s.
    * Near-dups = pairs with hamming distance ≤ maxHamming, blocked by
    * 16-bit chunks (a pair within distance 3 shares at least one of 4
    * chunks exactly — pigeonhole).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val t = filter(toks(col("text")), x => x =!= "")
    val hashes = transform(array_distinct(t), x => xxhash64(x))
    docs.select(col("doc_id"),
      graft.functions.expr.SketchExpressions
        .simhashSig(hashes, 64).as("simhash"))
  }

  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(docs)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("simhash"), c * 16)
          .bitwiseAND(0xFFFF)))
        .as(Seq("chunk_id", "chunk")))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------------------------
  // Oracle-parity variants. The production variants above use Spark's
  // xxhash64 (not available in DuckDB); these recompute the same structure
  // from md5 — available bit-identically in both engines — with all
  // arithmetic kept inside mod-prime ranges so neither engine overflows
  // (Spark 4 ANSI and DuckDB both error on int64 overflow).
  // ---------------------------------------------------------------------

  private val P = 2147483647L // 2^31 - 1, prime

  /** 28-bit deterministic string hash both engines share: top 28 bits of
    * md5 = the first 7 hex chars. DuckDB mirror:
    * `CAST(('0x'||substr(md5(s),1,7)) AS BIGINT)`. Codegen'd digest —
    * no hex-encode/re-parse per call.
    */
  def md5Hash28(c: Column): Column =
    graft.functions.expr.SketchExpressions.md5Hash28(c)

  /** MinHash signature array (oracle variant): sig(i) = min over distinct
    * shingles s of ((2i+1)·x(s) + (i·40503) mod P) mod P, x = [[md5Hash28]].
    */
  def minhashSignaturesOracle(numHashes: Int = 32, shingleN: Int = 3): Column =
    graft.functions.expr.SketchExpressions.minhashSigs(
      transform(shingles(col("text"), shingleN), s => md5Hash28(s)),
      numHashes)

  /** MinHash-LSH near-dup pairs, oracle-parity end to end: band the
    * signature (band hash = sequential fold (h·31 + sig) mod P), bucket
    * self-join, verify candidates with exact shingle Jaccard ≥ threshold.
    * Output (a, b, jaccard). Same banded-LSH shuffle shape as
    * [[minhashNearDups]] — never all-pairs.
    *
    * The result is MATERIALIZED (cached + counted) before returning so
    * the internal shingle cache can be unpersisted here rather than
    * leaking one cached shingle dataset per caller — downstream
    * consumers (clusters, source matrix, funnel, decontamination) reuse
    * the verified pairs, not the shingles.
    */
  def minhashPairsOracle(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    // sorted at materialization: the verify step's merge-intersect kernel
    // requires sorted input, and minhash sigs are order-independent (min
    // over transform) — mirrors minhashNearDups
    val sh = docs.select(col("doc_id"),
      array_sort(shingles(col("text"), shingleN)).as("sh")).cache()
    val sigs = sh.select(col("doc_id"),
      graft.functions.expr.SketchExpressions.minhashSigs(
        transform(col("sh"), s => md5Hash28(s)), numHashes).as("minhash"))
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => aggregate(slice(col("minhash"), b * rows + 1, lit(rows)),
          lit(0L), (acc, s) => (acc * 31 + s) % P)))
        .as(Seq("band_id", "band_hash")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val out = cands
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sa")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        jaccardSorted(col("sa"), col("sb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .cache()
    out.count() // materialize so sh can drop now (pairs <<< shingles)
    sh.unpersist()
    out
  }

  /** 28-bit SimHash (oracle variant): per-bit majority vote over distinct
    * tokens hashed with [[md5Hash28]]. Near-dup pairs blocked by two 14-bit
    * chunks (pigeonhole: hamming ≤ maxHamming < 14 shares a chunk... for
    * maxHamming ≤ 1 exactly; for 2-3 this is a high-recall heuristic — the
    * oracle computes the identical candidate set, so outputs still match).
    * Output (a, b, hamming).
    */
  def simhashPairsOracle(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val tk = array_distinct(filter(toks(col("text")), x => x =!= ""))
    val hs = transform(tk, t => md5Hash28(t))
    // signatures computed ONCE, in parallel (see jaccardPairsWithin):
    // per-token md5 over every doc is the expensive pass — widen the
    // one-split input, materialize, and let both self-join sides read it
    val sigs = Parallelism.widen(docs).select(col("doc_id"),
      graft.functions.expr.SketchExpressions
        .simhashSig(hs, 28).as("simhash"))
      .localCheckpoint(true)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array(
        col("simhash").bitwiseAND(0x3FFF),
        shiftright(col("simhash"), 14).bitwiseAND(0x3FFF)))
        .as(Seq("chunk_id", "chunk")))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup at scale: random-hyperplane LSH. Sign-bit bucket
    * over `planes` hyperplanes → self-join per bucket → verify cosine.
    * The bucket join is the only shuffle; all-pairs never materializes —
    * this is the production path [[cosineTopPairs]] is the oracle for.
    * Hyperplanes are deterministic (every `planeEvery`-th embedding row,
    * in vec_id order) so the DuckDB oracle reproduces the bucketing
    * bit-for-bit.
    */
  def cosineLshPairs(embeddings: DataFrame, threshold: Double,
      planeEvery: Int = 41, limit: Int = 100): DataFrame = {
    val planes = embeddings.filter(col("vec_id") % planeEvery === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val v = col("embedding").cast("array<double>")
    val bucket = planes.zipWithIndex.map { case ((_, pv), b) =>
      when(VectorFunctions.dotD(v, typedlit(pv.toSeq)) > 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    // norms precomputed per row (sqrt(v·v) once, not per pair) — the
    // division tree is unchanged so cosine stays bit-identical
    // bucket signatures (planes × rows dots) computed ONCE, in parallel
    // (see jaccardPairsWithin) — both self-join sides read the
    // materialized projection
    val bucketed = Parallelism.widen(embeddings)
      .select(col("vec_id"), v.as("e"), bucket.as("bucket"),
        sqrt(VectorFunctions.dotD(v, v)).as("nrm"))
      .localCheckpoint(true)
    bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        (VectorFunctions.dotD(col("x.e"), col("y.e"))
          / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("cosine").desc, col("a").asc, col("b").asc)
      .limit(limit)
  }

  /** Duplicate-cluster resolution: connected components over near-dup
    * pairs, each doc labeled with its component's minimum doc_id (the
    * canonical representative a curation pipeline keeps). Iterative
    * min-label propagation over the edge list — each round is one
    * join + hash-aggregate; converges in O(component diameter) rounds
    * (near-dup clusters are tiny and dense, so 2-4 in practice; the
    * large-star/small-star optimization only matters for pathological
    * chains). Deterministic, so SQL-oracle-able via a recursive
    * transitive-closure CTE — gated by `dedup_clusters` (plus the
    * DupClusterSpec unit cases).
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // undirected edges, both directions
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .unionByName(pairs.select(col("b").as("x"), col("a").as("y")))
      .distinct().cache()
    // localCheckpoint truncates the lineage each round — without it the
    // iterative plan grows until analysis dominates the runtime
    var labels = edges.select(col("x").as("doc_id"))
      .distinct()
      .withColumn("canonical_id", col("doc_id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // each node adopts the min label among itself and its neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "y"), Seq("y"))
        .groupBy(col("x").as("doc_id"))
        .agg(min(col("canonical_id")).as("nmin"))
      // carry the OLD label through the checkpoint: the convergence test
      // becomes a filter+count over the just-materialized rows instead of
      // a labels⋈updated join (which re-shuffled both sides every round)
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("canonical_id"), coalesce(col("nmin"),
            col("canonical_id"))).as("canonical_id"),
          col("canonical_id").as("__old"))
        .localCheckpoint(true)
      changed = updated
        .filter(col("canonical_id") =!= col("__old")).count()
      labels = updated.drop("__old")
      i += 1
    }
    // a chain component with diameter > maxIter would exit this loop with
    // silently-wrong labels (the oracle is an exact transitive closure) —
    // non-convergence must be LOUD, never a quiet wrong answer
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters did not converge after $maxIter iterations " +
          s"($changed labels still changing) — raise maxIter (component " +
          "diameter exceeds it)")
    labels
  }

  /** Cross-source near-duplication matrix: how much each source pair
    * duplicates each other — the curation question behind source mixing
    * ("is src A mostly a re-crawl of src B?"). Input is any verified
    * near-dup pair list (a, b); output one row per unordered source pair
    * with its pair count.
    *
    * Scale shape: the pair list is orders of magnitude smaller than the
    * corpus (only verified near-dups), so the two doc→source resolutions
    * are shuffle joins keyed by doc_id where the pairs side is tiny —
    * sort-merge co-partitioned with the (doc_id, source) projection,
    * never a corpus self-join; the final aggregate has ≤ |sources|²/2
    * groups with map-side combine.
    */
  def dupSourceMatrix(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("a"), col("source").as("sa")),
        Seq("a"))
      .join(src.select(col("doc_id").as("b"), col("source").as("sb")),
        Seq("b"))
      .groupBy(least(col("sa"), col("sb")).as("src_x"),
        greatest(col("sa"), col("sb")).as("src_y"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): pairwise cosine is computed ONLY within a
    * cluster of the shared centroid space, and each duplicate resolves
    * to the lowest-id earlier vector it matches. The cluster bound is
    * what makes this feasible at 100 TB — assignment is the map-side
    * codegen argmin (zero shuffle, see [[graft.index.Ivf.assign]]), the
    * only shuffle key is `(centroid_id, block-pair)`, and the quadratic
    * term is bounded by `maxBlock`: a cluster of size n splits into
    * B = ⌈n / maxBlock⌉ hash blocks, and the self-join runs per BLOCK
    * PAIR (i ≤ j) — within-block pairs on the diagonal keys, cross-block
    * boundary pairs on the (i < j) keys — so one hot cluster becomes
    * B(B+1)/2 bounded tasks spread across the shuffle instead of one
    * straggler. Pair coverage is exact (every unordered same-cluster pair
    * lands on exactly one block-pair key), so results are independent of
    * `maxBlock`; clusters under the budget keep B = 1 and the plan
    * degenerates to the plain per-cluster self-join. `assigned` must
    * carry `centroid_id`.
    *
    * The threshold is workload-tuned: ~0.95 on real web-scale embeddings;
    * the synthetic test embeddings have no true near-dups (max
    * within-cluster cosine 0.48 at sf0.01), so the correctness gate runs
    * at 0.3 purely to exercise the dataflow.
    *
    * Output: (vec_id, canonical_id) for every vector that is a semantic
    * duplicate of an earlier (lower-id) same-cluster vector.
    */
  def semanticDedup(assigned: DataFrame, threshold: Double,
      maxBlock: Int = 4096): DataFrame = {
    val sizes = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("__csz"))
    val side = assigned.join(broadcast(sizes), Seq("centroid_id"))
      .select(col("vec_id"), col("centroid_id"),
        col("embedding").as("e"),
        sqrt(VectorFunctions.dotD(col("embedding"), col("embedding")))
          .as("nrm"),
        ceil(col("__csz").cast("double") / maxBlock).cast("int").as("__nb"))
      .withColumn("__b",
        pmod(xxhash64(col("vec_id")), col("__nb")).cast("int"))
    // x carries block-pair keys (b, j) for j ∈ [b, B); y carries (i, b)
    // for i ∈ [0, b] — joining on the pair key yields each (i, j) block
    // pair exactly once
    val xs = side.withColumn("__j",
      explode(sequence(col("__b"), col("__nb") - 1)))
    val ys = side.withColumn("__i",
      explode(sequence(lit(0), col("__b"))))
    xs.as("x").join(ys.as("y"),
        col("x.centroid_id") === col("y.centroid_id") &&
          col("x.__b") === col("y.__i") && col("x.__j") === col("y.__b") &&
          // diagonal blocks order by id; cross blocks take every pair
          // (orientation is arbitrary there — normalized below)
          (col("x.__b") < col("y.__b") || col("x.vec_id") < col("y.vec_id")))
      .select(
        greatest(col("x.vec_id"), col("y.vec_id")).as("vec_id"),
        least(col("x.vec_id"), col("y.vec_id")).as("cand"),
        (VectorFunctions.dotD(col("x.e"), col("y.e"))
          / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("vec_id"))
      .agg(min(col("cand")).as("canonical_id"))
  }

  /** Top-`limit` embedding pairs by cosine — brute-force baseline for
    * embedding near-dup / ANN verification. Ties (cosine desc, a, b).
    */
  def cosineTopPairs(embeddings: DataFrame, limit: Int): DataFrame = {
    val v = col("embedding").cast("array<double>")
    // norms computed once in parallel; both all-pairs sides read the
    // materialized projection (see jaccardPairsWithin)
    val side = Parallelism.widen(embeddings)
      .select(col("vec_id"), v.as("e"),
        sqrt(VectorFunctions.dotD(v, v)).as("nrm"))
      .localCheckpoint(true)
    side.as("x")
      .join(side.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        (VectorFunctions.dotD(col("x.e"), col("y.e"))
          / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("a").asc, col("b").asc)
      .limit(limit)
  }

  /** Cross-document duplicated-SPAN detection — the sub-document exact-
    * substring dedup of "Deduplicating Training Data Makes Language
    * Models Better" (Lee et al. 2022, arXiv:2107.06499): any w-token
    * window whose content appears ≥ `minCount` times anywhere in the
    * corpus (another doc OR a repeat within the same doc) is a
    * duplicated span. Output, one row per document: window counts and
    * the number/fraction of tokens covered by at least one duplicated
    * window (overlapping [pos, pos+w) intervals merged).
    *
    * Spark-first shape (the paper's suffix array is a single-node
    * construct; corpus-wide window-hash counting is its distributed
    * analog): window hashes are a row-local zip_with rolling-hash chain
    * (same mod-prime polynomial as [[TextOps.fingerprint]] — no UDF, no
    * HOF-lambda re-evaluation), then the ONLY wide operations are the
    * window-hash count hash-aggregate (map-side combined) and the join
    * of windows against the ≥minCount hash set, both keyed by the
    * 31-bit window hash — never all-pairs, never a sort of the corpus.
    * Per-doc interval merge is a fold over that doc's sorted duplicate
    * positions (bounded by doc length, row-local after the join).
    *
    * The interval-merge fold packs (covered, lastEnd) into one BIGINT
    * (FLAG + covered·10^6 + end) so the SQL oracle can replay it with
    * DuckDB's init-less `list_reduce`; the Spark fold seeds with the
    * first element to match those semantics exactly.
    */
  def dupSpans(docs: DataFrame, w: Int = 8, minCount: Int = 2): DataFrame = {
    val P = 2147483647L // 2^31 − 1 (matches fingerprint/minhash oracles)
    val B = 1000003L
    val FLAG = 10000000000000L // 10^13: packed-state marker; positions and
    val PACK = 1000000L //        covered counts stay < 10^6 per doc
    val thE = transform(filter(toks(col("text")), x => x =!= ""),
      t => graft.functions.expr.SketchExpressions.md5Hash28(t))

    val base = docs.select(col("doc_id"), thE.as("__th"))
      .withColumn("__n", size(col("__th")))
    // window-hash array: after step k, acc(i) hashes tokens [i, i+k];
    // shifted copies null-pad so only complete windows survive the slice
    val whCol = {
      val th = col("__th"); val n = col("__n")
      var acc: Column = th
      for (k <- 1 until w) {
        val shifted = slice(th, lit(k + 1), greatest(n - k, lit(0)))
        acc = zip_with(acc, shifted, (a, h) => (a * B + h) % P)
      }
      when(n < w, array().cast("array<bigint>"))
        .otherwise(slice(acc, lit(1), n - w + 1))
    }
    val windows = base.select(col("doc_id"),
      posexplode(whCol).as(Seq("pos", "whash")))

    val dupHashes = windows.groupBy(col("whash"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("whash"))
    val dupWin = windows.join(dupHashes, Seq("whash"))

    // interval merge over sorted starts: state = FLAG + covered·PACK + end
    def unpackC(acc: Column): Column =
      floor((acc - FLAG) / PACK).cast("long")
    def unpackE(acc: Column): Column = (acc - FLAG) % PACK
    def merge(acc: Column, s: Column): Column = {
      val c = when(acc < FLAG, lit(w.toLong)).otherwise(unpackC(acc))
      val e = when(acc < FLAG, acc + w).otherwise(unpackE(acc))
      val add = greatest(s + w - greatest(e, s), lit(0L))
      lit(FLAG) + (c + add) * PACK + greatest(e, s + w)
    }
    val perDoc = dupWin.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_windows"),
        sort_array(collect_list(col("pos").cast("long"))).as("__ss"))
      .withColumn("dup_tokens",
        when(size(col("__ss")) === 1, lit(w.toLong))
          .otherwise(
            floor((aggregate(
              slice(col("__ss"), lit(2), size(col("__ss")) - 1),
              element_at(col("__ss"), 1),
              (acc, s) => merge(acc, s)) - FLAG) / PACK).cast("long")))
      .select(col("doc_id"), col("dup_windows"), col("dup_tokens"))

    // the doc spine only needs the token COUNT — recomputing the md5
    // token-hash transform here would double the row-local hash work
    val nTok = size(filter(toks(col("text")), x => x =!= ""))
    docs.select(col("doc_id"), nTok.cast("long").as("n_tokens"),
        greatest(nTok - (w - 1), lit(0)).cast("long").as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("dup_tokens"), lit(0L)).cast("double")
            / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }
}

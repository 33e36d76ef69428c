package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extras in BASELINE.json): token stats, quality scoring, language ID,
  * document fingerprinting. All row-local (no shuffle) — at 100 TB these
  * are pure map-side column derivations over a partitioned scan.
  */
object TextOps {

  /** Whitespace tokens, lowercased. Deterministic parity with the oracle's
    * `string_split(lower(text), ' ')` (both keep empty tokens).
    */
  def tokens(text: Column): Column = split(lower(text), " ", -1)

  /** Per-document token/quality statistics:
    * n_tokens, n_distinct tokens, type-token ratio, punctuation count,
    * tokens-per-char density. Ratios are exact integer divisions in double,
    * so they hash-match the oracle without rounding.
    */
  def textStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      (size(array_distinct(t)).cast("double") / size(t)).as("ttr"),
      (length(col("text")) - length(translate(col("text"), ".,!?", "")))
        .cast("long").as("n_punct"),
      (size(t).cast("double") / length(col("text"))).as("tokens_per_char"))
  }

  /** BPE-ish token counting + quality scoring (LLM-pipeline staples).
    * Tokenization: runs of letters, runs of digits, or single other
    * non-space characters — the shape of a byte-pair pre-tokenizer,
    * expressed as a regex both engines (Java regex / RE2) agree on for
    * ASCII classes. Quality = weighted mix of type-token ratio, stopword
    * ratio, and a length saturation term.
    */
  private val stopwords = Seq("the", "and", "of", "to", "in", "is", "that",
    "a", "for", "it")

  private def nStopwords(t: Column): Column =
    size(filter(t, x => array_contains(typedlit(stopwords), x)))

  /** The composite quality score over a token array — weighted mix of
    * type-token ratio, stopword ratio, and a length saturation term,
    * rounded to 6 places so both engines agree bit-for-bit. Shared by
    * [[tokenQuality]] and [[curationFunnel]].
    */
  private def qualityScore(t: Column): Column = {
    val nTok = size(t)
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val stopRatio = nStopwords(t).cast("double") / nTok
    val lenSat = least(lit(1.0), nTok.cast("double") / lit(100.0))
    round(lit(0.5) * ttr + lit(0.3) * stopRatio + lit(0.2) * lenSat, 6)
  }

  def tokenQuality(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val bpe = size(regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    docs.select(
      col("doc_id"),
      bpe.cast("long").as("n_bpe_tokens"),
      nStopwords(t).cast("long").as("n_stopwords"),
      qualityScore(t).as("quality"))
  }

  /** Repetition quality stats (the Gopher / RefinedWeb-style repetition
    * filters, Rae et al. 2021 §A1.1 / Penedo et al. 2023): duplicate-token
    * fraction, most-frequent-bigram share of bigram positions, and the
    * share of trigram positions covered by repeated trigrams. Entirely
    * row-local higher-order-function arithmetic — no explode, no shuffle;
    * the per-row cost is one sort per n-gram array. Divisions are exact int/int-in-double, so values
    * hash-match the oracle bit-for-bit.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    // n-grams joined on  (cannot appear in space-split tokens)
    def grams(k: Int): Column = transform(sequence(lit(0), n - k), i =>
      concat_ws("",
        (0 until k).map(j => element_at(t, i + j + 1)): _*))
    // Occurrence structure from ONE sort per gram array: the longest
    // equal-run in sorted order IS the max occurrence count, and a
    // position sits in a run of length >= 2 iff it equals a sorted
    // neighbor. O(n log n) per row — and every HOF here consumes a
    // top-level array. (The naive per-distinct-gram count
    // `filter(g, y => y === x)` re-evaluates g inside the lambda for
    // every x: HOFs are interpreted with no CSE across lambda calls,
    // which measured ~50x slower on this data.)
    def nextEq(g: Column): Column = {
      val s = array_sort(g)
      zip_with(s,
        concat(slice(s, lit(2), size(s) - 1), array(lit(null).cast("string"))),
        (a, b) => a <=> b)
    }
    def maxRun(ne: Column): Column =
      aggregate(ne, struct(lit(0).as("cur"), lit(0).as("best")),
        (acc, e) => {
          val cur = when(e, acc("cur") + 1).otherwise(lit(0))
          struct(cur.as("cur"), greatest(acc("best"), cur).as("best"))
        })("best") + 1
    def dupPositions(ne: Column): Column = {
      val prevEq = concat(array(lit(false)), slice(ne, lit(1), size(ne) - 1))
      size(filter(zip_with(ne, prevEq, (a, b) => a || b), x => x))
    }
    // short-doc guard: below k tokens there are no k-grams (and Spark's
    // sequence(0, n-k) would run DESCENDING for n < k) -> null fraction
    def guarded(k: Int, frac: => org.apache.spark.sql.Column) =
      when(n >= k, frac).otherwise(lit(null).cast("double"))
    docs.select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      ((n - size(array_distinct(t))).cast("double") / n)
        .as("dup_token_frac"),
      guarded(2, maxRun(nextEq(grams(2))).cast("double") / (n - 1))
        .as("top_bigram_frac"),
      guarded(3, dupPositions(nextEq(grams(3))).cast("double") / (n - 2))
        .as("dup_trigram_frac"))
  }

  /** Unigram LM quality score — the CCNet-style frequency filter
    * (Wenzek et al. 2019 use a 5-gram LM; the unigram variant keeps the
    * same "how typical is this doc's vocabulary" signal with exact
    * arithmetic): per-token corpus frequencies, per-doc mean frequency.
    * Log-free and integer-summed ON PURPOSE — `ln` differs by ulps
    * between libm implementations and distributed double sums are
    * order-dependent, but long sums are exact, so
    * avg_freq = sum_freq / (n_tokens · total) is bit-reproducible by the
    * DuckDB oracle.
    *
    * Scale shape: token counts are one hash-agg with map-side combine.
    * The score join is the hazard — it shuffles on token and natural
    * language is Zipfian ("the" alone is ~5% of all rows: one reducer
    * key inherits 5% of a 100 TB corpus). Mitigation (exact, not an
    * approximation): split the vocabulary into the top-`hotV` HEAD by
    * count (a driver-bounded TakeOrdered — hotV rows, KBs) and the
    * tail. Head rows resolve via a broadcast map-side join — the skewed
    * keys never shuffle; only tail rows (each token ≤ the rank-hotV
    * count by construction — skew-free) take the shuffle join. The
    * head/tail partition is exhaustive and exclusive, so the result is
    * bit-identical to the naive single join and the DuckDB oracle is
    * unchanged.
    */
  def unigramScore(docs: DataFrame, hotV: Int = 10000): DataFrame = {
    val t = filter(tokens(col("text")), x => x =!= "")
    val exploded = docs.select(col("doc_id"), explode(t).as("tok"))
    val counts = exploded.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).cast("long").as("n"))
    // hot head: TakeOrdered (never a global sort); ties at the boundary
    // broken by token so the set is deterministic — though ANY split is
    // correct, since both sides compute the same exact counts
    val hot = counts.orderBy(col("c").desc, col("tok").asc).limit(hotV)
    val probed = exploded.join(broadcast(hot), Seq("tok"), "left")
    val hotHits = probed.filter(col("c").isNotNull)
    val coldHits = probed.filter(col("c").isNull).drop("c")
      .join(counts, Seq("tok")) // tail only — no hot keys reach here
    hotHits.unionByName(coldHits)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("sum_freq"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("sum_freq").cast("long").as("sum_freq"),
        (col("sum_freq").cast("double")
          / (col("n_tokens").cast("double") * col("n").cast("double")))
          .as("avg_freq"))
  }

  /** Bigram LM quality score — the context-sensitive step of the CCNet
    * family ([[unigramScore]] measures vocabulary typicality; this
    * measures TRANSITION typicality: a word-salad doc built from common
    * words has common unigrams but rare bigrams). Same exact-arithmetic
    * contract: per-doc sum of corpus bigram counts over the doc's bigram
    * positions — integer sums, one final division, no logs — so the
    * DuckDB oracle replays it bit-for-bit.
    *
    * Scale shape: identical to the unigram path with the bigram string
    * as the join key. Bigram distributions are Zipfian too (flatter than
    * unigrams, but the head still dominates), so the same exact hot/cold
    * vocabulary split applies: top-`hotV` bigrams resolve via broadcast
    * map-side, only the skew-free tail shuffles.
    */
  def bigramScore(docs: DataFrame, hotV: Int = 10000): DataFrame = {
    val tAttr = col("__t")
    val grams = transform(sequence(lit(0), size(tAttr) - 2),
      i => concat_ws(" ", slice(tAttr, i + 1, lit(2))))
    val exploded = docs
      .select(col("doc_id"), filter(tokens(col("text")), x => x =!= "")
        .as("__t"))
      .select(col("doc_id"),
        explode(when(size(tAttr) >= 2, grams).otherwise(array()))
          .as("bg"))
    val counts = exploded.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).cast("long").as("n"))
    val hot = counts.orderBy(col("c").desc, col("bg").asc).limit(hotV)
    val probed = exploded.join(broadcast(hot), Seq("bg"), "left")
    val hotHits = probed.filter(col("c").isNotNull)
    val coldHits = probed.filter(col("c").isNull).drop("c")
      .join(counts, Seq("bg"))
    hotHits.unionByName(coldHits)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("c")).as("sum_freq"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        col("n_bigrams").cast("long").as("n_bigrams"),
        col("sum_freq").cast("long").as("sum_freq"),
        (col("sum_freq").cast("double")
          / (col("n_bigrams").cast("double") * col("n").cast("double")))
          .as("avg_freq"))
  }

  /** Cross-doc boilerplate n-grams: the curator query behind boilerplate
    * removal — every n-gram occurring in ≥2 distinct docs, ranked by
    * total occurrences. One explode + one hash-agg with map-side
    * combine; the top-k is a TakeOrdered, never a global sort.
    */
  def boilerplateNgrams(docs: DataFrame, n: Int = 5,
      limit: Int = 50): DataFrame = {
    // tokens materialize as a projected ATTRIBUTE below the generate so
    // the per-window lambda slices a computed array instead of
    // re-tokenizing per position (interpreted HOFs have no CSE — the
    // inline form measured ~4 s at sf0.1, this one ~1 s)
    val tAttr = col("__t")
    // all positions (not distinct): occurrence counts need multiplicity
    val grams = transform(sequence(lit(0), size(tAttr) - n),
      i => concat_ws(" ", slice(tAttr, i + 1, lit(n))))
    Parallelism.widen(docs) // see bigramScore — the explode pass is the cost
      .select(col("doc_id"),
        filter(tokens(col("text")), x => x =!= "").as("__t"))
      .select(col("doc_id"),
        explode(when(size(tAttr) >= n, grams).otherwise(array()))
          .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(limit)
  }

  /** PII redaction: replace email addresses with a fixed token and count
    * them (the standard pre-training scrub stage). The pattern stays in
    * the common Java-regex/RE2 subset so the DuckDB oracle replays it;
    * output carries an md5 of the redacted text rather than the text
    * itself (compact, still an exact equality witness). Row-local, no
    * shuffle.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      md5(regexp_replace(col("text"), emailRe, "<EMAIL>").cast("binary"))
        .as("redacted_md5"))
  }

  /** Benchmark decontamination — the standard pre-training scrub that
    * finds training docs sharing any word n-gram with an evaluation/
    * benchmark set (so eval answers don't leak into training data). Per
    * doc: how many distinct benchmark n-grams it contains, and the flag.
    *
    * Scale shape: doc shingles explode once, the benchmark side reduces
    * to a DISTINCT n-gram set, and the only shuffle is the semi-join on
    * the n-gram key (map-side combine on the count). Benchmark sets are
    * usually small enough that Spark broadcasts that side automatically;
    * docs with zero hits survive via the left join.
    */
  def contamination(docs: DataFrame, benchDocs: DataFrame,
      n: Int = 8): DataFrame = {
    import graft.operators.DedupOps.shingles
    val dSh = docs.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("sh"))
    val bSh = benchDocs.select(explode(shingles(col("text"), n)).as("sh"))
      .distinct()
    val hits = dSh.join(bSh, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).cast("long")
          .as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Balanced source mixing — downsample every source to the size of the
    * smallest one (the standard equal-mix curriculum step), with a
    * DETERMINISTIC content-hash gate so the same doc is kept or dropped
    * regardless of partitioning or run (same leakage-safe property as
    * [[hashSplit]]). The keep test is pure integer arithmetic
    * (hash·count < min·2^28), so the DuckDB oracle replays it exactly.
    * One tiny counts aggregate broadcast back; the gate itself is
    * row-local.
    */
  def balancedMix(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("__n"))
    // global min via a 1-row aggregate cross-joined back — counts is
    // n_sources rows, so this stays a broadcast; an empty-partition
    // window would compute the same value through a single-partition
    // WindowExec (and warn about it on every run)
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("__n")).as("__min"))))
    val h = graft.functions.expr.SketchExpressions.md5Hash28(col("text"))
    docs.join(broadcast(withMin), Seq("source"))
      .filter(h * col("__n") < col("__min") * lit(1L << 28))
      .select(col("doc_id"), col("source"))
  }

  /** Temperature-smoothed source mixing (the α = 0.5 exponential
    * smoothing used for multilingual/source rebalancing in pretraining —
    * keep rate ∝ n_s^(α−1), so kept counts ∝ n_s^α: big sources are
    * downsampled toward, small sources kept whole). Anchored at the
    * smallest source (its keep rate is 1), which removes the cross-source
    * normalization SUM — a distributed double sum is order-dependent and
    * would let the two engines disagree in the last ulp on gate
    * boundaries. Everything left is IEEE-exact: one integer count min,
    * one division, one `sqrt` (correctly rounded by IEEE 754 — `pow`/`ln`
    * are NOT, which is why α is fixed at 0.5), one multiply, and the
    * deterministic 28-bit content-hash gate shared with [[balancedMix]].
    *
    * Scale shape: counts are one tiny aggregate broadcast back; the gate
    * is row-local — no shuffle of the corpus.
    */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("__n"))
    // same broadcast global-min shape as [[balancedMix]] — no window
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("__n")).as("__min"))))
    val h = graft.functions.expr.SketchExpressions.md5Hash28(col("text"))
    val keepRate = sqrt(col("__min").cast("double") / col("__n"))
    docs.join(broadcast(withMin), Seq("source"))
      .filter(h.cast("double") < keepRate * lit((1L << 28).toDouble))
      .select(col("doc_id"), col("source"))
  }

  /** End-to-end curation funnel — the per-source survival counts through
    * the pipeline's sequential gates (the report every corpus-curation run
    * ends with): all docs → quality score ≥ `minQuality` → duplicate-token
    * fraction ≤ `maxDupFrac` → not a near-duplicate loser (docs appearing
    * as the higher-id `b` side of a verified near-dup pair). The pair-based
    * drop set APPROXIMATES a keep-lowest-id dedup pass — exact when every
    * non-canonical doc pairs directly with a lower id; a doc reachable only
    * through a chain (never the `b` of any pair, e.g. doc 2 with pairs
    * (2,3),(1,3)) survives the funnel where a cluster-canonical pass
    * ([[graft.operators.DedupOps.dupClusters]]) would drop it — derive
    * losers from dupClusters when cluster-exact counts are needed.
    *
    * Scale shape: both row-local gates are computed inline on the scan (no
    * join back to a separate quality table — one pass); the loser set is
    * the only join, keyed by doc_id against a pair list that is orders of
    * magnitude smaller than the corpus; the final aggregate has |sources|
    * groups with map-side combine.
    */
  def curationFunnel(docs: DataFrame, dupPairs: DataFrame,
      minQuality: Double = 0.36, maxDupFrac: Double = 0.6): DataFrame = {
    val t = tokens(col("text"))
    val dupFrac = (size(t) - size(array_distinct(t))).cast("double") / size(t)
    val losers = dupPairs.select(col("b").as("doc_id")).distinct()
      .withColumn("__dup", lit(true))
    val qOk = col("quality") >= minQuality
    val cleanOk = qOk && col("dup_frac") <= maxDupFrac
    docs.select(col("doc_id"), col("source"),
        qualityScore(t).as("quality"), dupFrac.as("dup_frac"))
      .join(losers, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(qOk, 1)).as("n_quality"),
        count(when(cleanOk, 1)).as("n_clean"),
        count(when(cleanOk && col("__dup").isNull, 1)).as("n_kept"))
  }

  /** Sequence packing — the pretraining step that concatenates documents
    * (in deterministic doc_id order) into fixed token-budget training
    * sequences: each doc gets the global token offset where it starts and
    * the sequence its start falls in.
    *
    * The global running sum is a DISTRIBUTED PREFIX-SUM, not a
    * single-partition window (the naive `Window.orderBy(doc_id)` with no
    * partition key funnels 100 TB through one task): range-partition by
    * doc_id, per-partition running sums in parallel (window keyed by
    * partition id), and a driver-side exclusive scan over the ≤P
    * per-partition totals broadcast back as offsets. Exact long
    * arithmetic end to end, so the DuckDB window-cumsum oracle matches
    * bit-for-bit.
    */
  def packSequences(docs: DataFrame, budgetTokens: Long = 2048,
      numPartitions: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    // tokenize ONCE: the interpreted-HOF token count would otherwise run
    // three times (the range partitioner's sampling pass, the totals
    // pass, the final pass) — materialize the narrow (doc_id, n_tokens)
    // projection eagerly and let every pass read that instead. Local
    // checkpoint, not cache(): the block lives with THIS plan instance,
    // so a re-invocation recomputes from the parquet inputs.
    val tokenCounts = docs
      .select(col("doc_id"),
        size(filter(tokens(col("text")), x => x =!= ""))
          .cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val counted = tokenCounts
      .repartitionByRange(numPartitions, col("doc_id"))
      .withColumn("__pid", spark_partition_id())
    // per-partition totals -> driver exclusive scan (≤ numPartitions rows)
    val totals = counted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (pid, t) =>
        val off = acc; acc += t; (pid, off)
      } // (pid, tokens before this partition)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    counted.join(broadcast(offDf), Seq("__pid"))
      .withColumn("seq_start",
        col("__off") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        col("seq_start").cast("long").as("seq_start"),
        floor(col("seq_start") / budgetTokens).cast("long").as("seq_id"))
  }

  /** Deterministic train/val/test split by content hash (the standard
    * leakage-safe pipeline split: same doc always lands in the same
    * split, independent of partitioning/order). md5-derived so the
    * DuckDB oracle reproduces it.
    */
  def hashSplit(docs: DataFrame, keyCol: Column,
      trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = pmod(
      conv(substring(md5(keyCol.cast("string")), 1, 7), 16, 10).cast("long"),
      lit(100))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic stratified sampling: the k lowest-content-hash
    * documents per source — the stable "fixed eval slice per domain" a
    * large curation run pins (same docs under reruns and repartitioning;
    * corpus growth only perturbs the margin).
    *
    * Spark-first shape: per-source top-k rides the bounded-heap native
    * aggregate ([[TopK.viaAggregator]]) — map-side partial heaps, the
    * shuffle carries at most k rows per source per task, and no
    * per-source sort ever happens (the window row_number alternative
    * sorts the whole corpus inside each source partition — the thing
    * that dies on a billion-row source). The k×|sources| winner set is
    * then broadcast back against the corpus to recover attributes, and
    * in-sample ranks come from a window over k-bounded groups.
    *
    * The heap's group key is the first 60 bits of md5(source) — no
    * dictionary pass; cross-source collisions at tens-of-sources
    * cardinality are ~2^-55 and deterministic. The sample hash is the
    * same md5-28-bit-of-doc_id the split operator uses, so the DuckDB
    * oracle replays both.
    */
  def stratifiedSample(docs: DataFrame, k: Int = 5): DataFrame = {
    import graft.operators.TopK
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
      .cast("long")
    val srcKey = conv(substring(md5(col("source")), 1, 15), 16, 10)
      .cast("long")
    // negate: the heap keeps (score desc, id asc) = smallest hashes,
    // ties to the lower doc_id — exactly ORDER BY hv, doc_id. 28-bit
    // values round-trip double exactly.
    val scored = docs.select(srcKey.as("__src"), col("doc_id"),
      (-hv).cast("double").as("__neg"))
    val top = TopK.viaAggregator(scored, "__src", "doc_id", "__neg", k)
      .select(col("doc_id"), (-col("__neg")).cast("long").as("hv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(top), Seq("doc_id"))
      .withColumn("smp_rank", row_number().over(w).cast("long"))
      .select(col("source"), col("doc_id"), col("smp_rank"))
  }

  /** Language stopword lists for the n-gram/stopword language-ID heuristic.
    * Order is the tie-break priority.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "que", "los", "una", "por", "como"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Language ID: distinct-stopword-hit count per language over whitespace
    * tokens; argmax with ties broken by profile order; no hits at all →
    * "und" (undetermined). Deterministic and oracle-expressible
    * (`len(list_intersect(tokens, [...]))` in DuckDB).
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val hits = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(t, lit(words.toArray)))
    }
    val best = hits.tail.foldLeft[Column](
      struct(hits.head._2.as("h"), lit(hits.head._1).as("l"))) {
      case (acc, (lang, h)) =>
        when(h > acc("h"), struct(h.as("h"), lit(lang).as("l"))).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang").as("labeled_lang"),
        best.as("best"))
      .select(col("doc_id"), col("labeled_lang"),
        when(col("best.h") > 0, col("best.l")).otherwise(lit("und"))
          .as("pred_lang"))
  }

  /** Rolling polynomial hash fingerprint (winnowing-style): hash every
    * w-token window with a base-1000003 mod-(2^31−1) rolling hash over
    * md5-derived token hashes, keep the minimum — a robust-to-reordering-
    * at-the-margins content fingerprint, fully oracle-expressible
    * (`list_reduce` over `md5` token hashes in DuckDB; mod-prime keeps
    * every intermediate in BIGINT range, same trick as the minhash
    * oracle).
    *
    * No UDF and no array expression inside a lambda body: window hashes
    * build as a zip_with CHAIN over SHIFTED copies of the token-hash
    * array — after step k, acc(i) is the hash of tokens [i, i+k]; shorter
    * shifted arrays null-pad, so incomplete tail windows go null and
    * `array_min` (null-skipping) sees only complete windows. Row-local,
    * O(w·n) per row, no shuffle.
    */
  def fingerprint(docs: DataFrame, w: Int = 4): DataFrame = {
    val P = 2147483647L // 2^31 - 1, prime (matches the minhash oracle)
    val B = 1000003L
    val toksE = filter(tokens(col("text")), x => x =!= "")
    val thE = transform(toksE, t =>
      graft.functions.expr.SketchExpressions.md5Hash28(t))
    val fpCol = {
      val th = col("__th")
      val n = size(th)
      // acc_k(i) = hash of tokens [i, i+k]; th values are 28-bit < P, so
      // the k=0 chain is th itself ((0·B + h) mod P = h)
      var acc: Column = th
      for (k <- 1 until w) {
        val shifted = slice(th, lit(k + 1), greatest(n - k, lit(0)))
        acc = zip_with(acc, shifted, (a, h) => (a * B + h) % P)
      }
      when(n === 0, lit(0L))
        .when(n < w, aggregate(th, lit(0L), (a, h) => (a * B + h) % P))
        .otherwise(array_min(acc))
    }
    docs.withColumn("__th", thE)
      .select(col("doc_id"), fpCol.as("fingerprint"))
  }
}

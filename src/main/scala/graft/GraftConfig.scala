package graft

import graft.index.ServingLimits
import graft.ingest.IngestLimits
import graft.streaming.{Wal, WalCodec}

/** Loadable engine configuration — the analogue of the reference's
  * `loadConfig`/`validateConfig`/`applyDefaults` surface
  * (src/cpp/core/config.cpp:14-74 over configs/woved-default.yaml):
  * one typed tree whose defaults ARE the reference's defaults, with a
  * YAML overlay so a user stands up the engine from a file instead of
  * re-plumbing every constructor parameter by hand.
  *
  * Sections map onto the engine's existing parameter types rather than
  * duplicating them: `limits` → [[graft.ingest.IngestLimits]] +
  * [[graft.index.ServingLimits]], `storage.wal` → the [[Wal]] knobs and
  * [[WalCodec]], `index.*` → the nlist/nprobe/PQ/HNSW build parameters,
  * `tuning` → the [[graft.index.AdaptiveNprobe]] bands. Sections the
  * Spark engine deliberately does not mirror (server ports, io_uring,
  * NUMA — the JVM/cluster owns those) parse without error and are
  * ignored, so the reference's own config files load as-is.
  */
final case class GraftConfig(
    collection: GraftConfig.Collection = GraftConfig.Collection(),
    wal: GraftConfig.WalConf = GraftConfig.WalConf(),
    segment: GraftConfig.Segment = GraftConfig.Segment(),
    delta: GraftConfig.DeltaIndex = GraftConfig.DeltaIndex(),
    stable: GraftConfig.StableIndex = GraftConfig.StableIndex(),
    global: GraftConfig.GlobalIndex = GraftConfig.GlobalIndex(),
    hnswCache: GraftConfig.HnswCache = GraftConfig.HnswCache(),
    filtering: GraftConfig.Filtering = GraftConfig.Filtering(),
    query: GraftConfig.Query = GraftConfig.Query(),
    tuning: GraftConfig.Tuning = GraftConfig.Tuning(),
    limits: GraftConfig.Limits = GraftConfig.Limits(),
    recovery: GraftConfig.Recovery = GraftConfig.Recovery(),
    workerThreads: Int = 0) {

  /** `limits` + `query` as the serving-side cap object every probe path
    * takes (config.h:128-131,180).
    */
  def servingLimits: ServingLimits = ServingLimits(
    maxK = query.maxTopK,
    maxCandidates = query.maxCandidates,
    maxBatch = limits.maxQueryBatch,
    deadlineMs = query.timeoutMs)

  /** `limits` + `collection.dim` + `filtering` as the ingest guard's
    * cap object (config.h:177-182).
    */
  def ingestLimits: IngestLimits = IngestLimits(
    maxUpsertBatch = limits.maxUpsertBatch,
    maxRequestBytes = limits.maxRequestBytes,
    maxTagsPerVector = filtering.maxTagsPerVector,
    tagDictSize = filtering.tagDictSize,
    dim = collection.dim)

  def walCodec: WalCodec = WalCodec.of(wal.compression)

  /** applyDefaults (config.cpp:70-74): worker_threads 0 = auto-detect. */
  def resolvedWorkerThreads: Int =
    if (workerThreads > 0) workerThreads
    else Runtime.getRuntime.availableProcessors()

  /** validateConfig (config.cpp:62-68) — the checks the reference stubs
    * out, made real: throws IllegalArgumentException on the first
    * violated invariant.
    */
  def validate(): GraftConfig = {
    def req(ok: Boolean, msg: => String): Unit = require(ok, msg)
    req(collection.dim > 0, s"collection.dim must be > 0: ${collection.dim}")
    req(Set("ip", "l2", "cosine")(collection.metric),
      s"collection.metric must be ip|l2|cosine: ${collection.metric}")
    req(collection.maxVectors > 0, "collection.max_vectors must be > 0")
    req(wal.rotateBytes > 0, "wal.rotate_bytes must be > 0")
    req(wal.maxFiles >= 1, s"wal.max_files must be >= 1: ${wal.maxFiles}")
    WalCodec.of(wal.compression) // throws on unknown codec
    req(segment.targetSizeVectors > 0, "segment.target_size_vectors > 0")
    req(segment.tombstoneRatioThreshold >= 0 &&
      segment.tombstoneRatioThreshold <= 1,
      "segment.tombstone_ratio_threshold in [0,1]")
    req(delta.nlist > 0 && stable.nlist > 0, "nlist must be > 0")
    req(delta.nprobe >= 1 && delta.nprobe <= delta.nlist,
      s"delta.nprobe ${delta.nprobe} must be in [1, nlist ${delta.nlist}]")
    req(stable.nprobe >= 1 && stable.nprobe <= stable.nlist,
      s"stable.nprobe ${stable.nprobe} in [1, nlist ${stable.nlist}]")
    req(stable.pqM > 0 && collection.dim % stable.pqM == 0,
      s"pq.m ${stable.pqM} must divide collection.dim ${collection.dim}")
    req(stable.pqNbits >= 1 && stable.pqNbits <= 16,
      s"pq.nbits ${stable.pqNbits} in [1,16]")
    req(stable.rerankFactor >= 1, "stable.rerank_factor >= 1")
    req(global.memoryCacheMb > 0, "global.memory_cache_mb > 0")
    req(hnswCache.maxElements > 0 && hnswCache.m > 0 &&
      hnswCache.efConstruction > 0 && hnswCache.ef > 0,
      "hnsw_cache parameters must be > 0")
    req(filtering.bloomFilterFpp > 0 && filtering.bloomFilterFpp < 1,
      "filtering.bloom_filter_fpp in (0,1)")
    req(filtering.denseBitmapThreshold >= 0 &&
      filtering.denseBitmapThreshold <= 1,
      "filtering.dense_bitmap_threshold in [0,1]")
    req(filtering.maxTagsPerVector > 0 && filtering.tagDictSize > 0,
      "filtering tag limits must be > 0")
    req(query.defaultTopK >= 1 && query.defaultTopK <= query.maxTopK,
      s"query.default_top_k ${query.defaultTopK} in [1, max_top_k]")
    req(query.maxCandidates >= query.maxTopK,
      "query.max_candidates must cover max_top_k")
    req(tuning.recallTarget > 0 && tuning.recallTarget <= 1,
      "tuning.recall_target in (0,1]")
    req(tuning.nprobeDeltaMin >= 1 &&
      tuning.nprobeDeltaMax >= tuning.nprobeDeltaMin,
      "tuning delta band [min, max]")
    req(tuning.nprobeStableMin >= 1 &&
      tuning.nprobeStableMax >= tuning.nprobeStableMin,
      "tuning stable band [min, max]")
    req(limits.maxUpsertBatch > 0 && limits.maxQueryBatch > 0 &&
      limits.maxRequestBytes > 0, "limits must be > 0")
    req(recovery.maxRecoveryTimeS > 0 && recovery.checkpointIntervalS > 0,
      "recovery cadences must be > 0")
    this
  }
}

object GraftConfig {

  /** collection: (yaml:14-18, config.h). */
  final case class Collection(dim: Int = 768, metric: String = "ip",
      maxVectors: Long = 100000000L, idType: String = "uuidv7")

  /** storage.wal (yaml:41-52). */
  final case class WalConf(
      rotateBytes: Long = Wal.defaultRotateBytes,
      maxFiles: Int = Wal.defaultMaxFiles,
      compression: String = "none",
      groupCommitMs: Int = 8,
      fenceEveryMs: Int = 5,
      fsyncEveryFences: Int = 50)

  /** storage.segment (yaml:54-60). `exactTombstonePurge` (engine
    * extension, default off) switches minor compaction from the
    * conservative range-retention of tombstones to a per-tombstone
    * existence probe against the stable tier — exact purge at the cost
    * of one probe scan per compaction.
    */
  final case class Segment(targetSizeVectors: Long = 2000000L,
      maxSegmentsPerLeaf: Int = 8, tombstoneRatioThreshold: Double = 0.2,
      exactTombstonePurge: Boolean = false)

  /** index.delta (yaml:63-71): the fresh tier's IVF-flat build. */
  final case class DeltaIndex(nlist: Int = 1024, nprobe: Int = 6,
      sampleP: Double = 0.25, listCap: Int = 2000,
      globalCentroids: Boolean = true, rebuildIntervalHours: Int = 24)

  /** index.stable (yaml:73-82): the cold tier's IVF-PQ build. */
  final case class StableIndex(nlist: Int = 4096, nprobe: Int = 12,
      pqM: Int = 96, pqNbits: Int = 8, useOpq: Boolean = true,
      rerankFactor: Int = 4)

  /** index.global (yaml:84-88): the driver-resident cache tiers'
    * shared byte budget.
    */
  final case class GlobalIndex(indexType: String = "ivf",
      nlist: Int = 1024, memoryCacheMb: Int = 512) {
    def memoryCacheBytes: Long = memoryCacheMb.toLong * 1024 * 1024
  }

  /** index.hnsw_cache (yaml:90-96). */
  final case class HnswCache(enabled: Boolean = false,
      maxElements: Int = 1000000, m: Int = 16, efConstruction: Int = 200,
      ef: Int = 50)

  /** filtering (yaml:98-105). */
  final case class Filtering(bitmapCacheBytes: Long = 1073741824L,
      perSegmentSoftCapBytes: Long = 134217728L,
      bloomFilterEnabled: Boolean = true, bloomFilterFpp: Double = 0.01,
      tagDictSize: Int = 50000, maxTagsPerVector: Int = 16,
      denseBitmapThreshold: Double = 0.2)

  /** query (yaml:107-115). */
  final case class Query(timeoutMs: Long = 5000L, maxCandidates: Int = 10000,
      defaultTopK: Int = 10, maxTopK: Int = 100,
      twoPhaseEnabled: Boolean = true, bufferScanEnabled: Boolean = true)

  /** tuning (yaml:117-125) — the AdaptiveNprobe bands. */
  final case class Tuning(recallTarget: Double = 0.95,
      autoTuneEnabled: Boolean = true, nprobeDeltaMin: Int = 4,
      nprobeDeltaMax: Int = 8, nprobeStableMin: Int = 8,
      nprobeStableMax: Int = 16, persistDecisions: Boolean = true,
      decisionWindowHours: Int = 1)

  /** limits (yaml:163-169). */
  final case class Limits(maxUpsertBatch: Int = 10000,
      maxQueryBatch: Int = 100, maxRequestBytes: Long = 104857600L)

  /** recovery (yaml:171-175). */
  final case class Recovery(checkpointIntervalS: Int = 60,
      maxRecoveryTimeS: Int = 30, parallelRecoveryThreads: Int = 4,
      verifyChecksums: Boolean = true)

  /** The reference's defaults, no file needed. */
  val default: GraftConfig = GraftConfig()

  /** loadConfig (config.cpp:14-60): parse the YAML at `path`, overlay
    * present keys onto the defaults (missing keys keep their default —
    * applyDefaults), validate, return. Unknown sections/keys are
    * ignored (the reference's own yaml carries server/io/numa sections
    * this engine deliberately has no analogue for).
    */
  def load(path: String): GraftConfig = {
    val in = new java.io.FileInputStream(path)
    try loadYaml(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** [[load]] over an in-memory YAML string. */
  def loadYaml(yamlText: String): GraftConfig = {
    val root = Node(new org.yaml.snakeyaml.Yaml().load[Object](yamlText))
    val d = default
    val coll = root / "collection"
    val stor = root / "storage"
    val walN = stor / "wal"
    val segN = stor / "segment"
    val idx = root / "index"
    val deltaN = idx / "delta"
    val stableN = idx / "stable"
    val pqN = stableN / "pq"
    val globalN = idx / "global"
    val hnswN = idx / "hnsw_cache"
    val filtN = root / "filtering"
    val qryN = root / "query"
    val tunN = root / "tuning"
    val limN = root / "limits"
    val recN = root / "recovery"
    GraftConfig(
      collection = Collection(
        dim = coll.int("dim", d.collection.dim),
        metric = coll.str("metric", d.collection.metric),
        maxVectors = coll.long("max_vectors", d.collection.maxVectors),
        idType = coll.str("id_type", d.collection.idType)),
      wal = WalConf(
        rotateBytes = walN.long("rotate_bytes", d.wal.rotateBytes),
        maxFiles = walN.int("max_files", d.wal.maxFiles),
        compression = walN.str("compression", d.wal.compression),
        groupCommitMs = walN.int("group_commit_ms", d.wal.groupCommitMs),
        fenceEveryMs = walN.int("fence_every_ms", d.wal.fenceEveryMs),
        fsyncEveryFences =
          walN.int("fsync_every_fences", d.wal.fsyncEveryFences)),
      segment = Segment(
        targetSizeVectors =
          segN.long("target_size_vectors", d.segment.targetSizeVectors),
        maxSegmentsPerLeaf =
          segN.int("max_segments_per_leaf", d.segment.maxSegmentsPerLeaf),
        tombstoneRatioThreshold = segN.dbl("tombstone_ratio_threshold",
          d.segment.tombstoneRatioThreshold),
        exactTombstonePurge = segN.bool("exact_tombstone_purge",
          d.segment.exactTombstonePurge)),
      delta = DeltaIndex(
        nlist = deltaN.int("nlist", d.delta.nlist),
        nprobe = deltaN.int("nprobe", d.delta.nprobe),
        sampleP = deltaN.dbl("sample_p", d.delta.sampleP),
        listCap = deltaN.int("list_cap", d.delta.listCap),
        globalCentroids =
          deltaN.bool("global_centroids", d.delta.globalCentroids),
        rebuildIntervalHours = deltaN.int("rebuild_interval_hours",
          d.delta.rebuildIntervalHours)),
      stable = StableIndex(
        nlist = stableN.int("nlist", d.stable.nlist),
        nprobe = stableN.int("nprobe", d.stable.nprobe),
        pqM = pqN.int("m", d.stable.pqM),
        pqNbits = pqN.int("nbits", d.stable.pqNbits),
        useOpq = pqN.bool("use_opq", d.stable.useOpq),
        rerankFactor = stableN.int("rerank_factor", d.stable.rerankFactor)),
      global = GlobalIndex(
        indexType = globalN.str("type", d.global.indexType),
        nlist = globalN.int("nlist", d.global.nlist),
        memoryCacheMb =
          globalN.int("memory_cache_mb", d.global.memoryCacheMb)),
      hnswCache = HnswCache(
        enabled = hnswN.bool("enabled", d.hnswCache.enabled),
        maxElements = hnswN.int("max_elements", d.hnswCache.maxElements),
        m = hnswN.int("m", d.hnswCache.m),
        efConstruction =
          hnswN.int("ef_construction", d.hnswCache.efConstruction),
        ef = hnswN.int("ef", d.hnswCache.ef)),
      filtering = Filtering(
        bitmapCacheBytes =
          filtN.long("bitmap_cache_bytes", d.filtering.bitmapCacheBytes),
        perSegmentSoftCapBytes = filtN.long("per_segment_soft_cap_bytes",
          d.filtering.perSegmentSoftCapBytes),
        bloomFilterEnabled =
          filtN.bool("bloom_filter_enabled", d.filtering.bloomFilterEnabled),
        bloomFilterFpp =
          filtN.dbl("bloom_filter_fpp", d.filtering.bloomFilterFpp),
        tagDictSize = filtN.int("tag_dict_size", d.filtering.tagDictSize),
        maxTagsPerVector =
          filtN.int("max_tags_per_vector", d.filtering.maxTagsPerVector),
        denseBitmapThreshold = filtN.dbl("dense_bitmap_threshold",
          d.filtering.denseBitmapThreshold)),
      query = Query(
        timeoutMs = qryN.long("timeout_ms", d.query.timeoutMs),
        maxCandidates = qryN.int("max_candidates", d.query.maxCandidates),
        defaultTopK = qryN.int("default_top_k", d.query.defaultTopK),
        maxTopK = qryN.int("max_top_k", d.query.maxTopK),
        twoPhaseEnabled =
          qryN.bool("two_phase_enabled", d.query.twoPhaseEnabled),
        bufferScanEnabled =
          qryN.bool("buffer_scan_enabled", d.query.bufferScanEnabled)),
      tuning = Tuning(
        recallTarget = tunN.dbl("recall_target", d.tuning.recallTarget),
        autoTuneEnabled =
          tunN.bool("auto_tune_enabled", d.tuning.autoTuneEnabled),
        nprobeDeltaMin =
          tunN.int("nprobe_delta_min", d.tuning.nprobeDeltaMin),
        nprobeDeltaMax =
          tunN.int("nprobe_delta_max", d.tuning.nprobeDeltaMax),
        nprobeStableMin =
          tunN.int("nprobe_stable_min", d.tuning.nprobeStableMin),
        nprobeStableMax =
          tunN.int("nprobe_stable_max", d.tuning.nprobeStableMax),
        persistDecisions =
          tunN.bool("persist_decisions", d.tuning.persistDecisions),
        decisionWindowHours = tunN.int("decision_window_hours",
          d.tuning.decisionWindowHours)),
      limits = Limits(
        maxUpsertBatch = limN.int("max_upsert_batch", d.limits.maxUpsertBatch),
        maxQueryBatch = limN.int("max_query_batch", d.limits.maxQueryBatch),
        maxRequestBytes =
          limN.long("max_request_size_bytes", d.limits.maxRequestBytes)),
      recovery = Recovery(
        checkpointIntervalS =
          recN.int("checkpoint_interval_s", d.recovery.checkpointIntervalS),
        maxRecoveryTimeS =
          recN.int("max_recovery_time_s", d.recovery.maxRecoveryTimeS),
        parallelRecoveryThreads = recN.int("parallel_recovery_threads",
          d.recovery.parallelRecoveryThreads),
        verifyChecksums =
          recN.bool("verify_checksums", d.recovery.verifyChecksums)),
      workerThreads = (root / "server").int("worker_threads", 0)
    ).validate()
  }

  /** Typed navigation over snakeyaml's untyped Map tree. Type errors
    * (a string where a number belongs) throw with the offending key —
    * silently coercing would bury a config mistake.
    */
  private final case class Node(v: Object) {
    def /(key: String): Node = v match {
      case m: java.util.Map[_, _] =>
        Node(m.asInstanceOf[java.util.Map[String, Object]].get(key))
      case _ => Node(null)
    }
    private def get(key: String): Option[Object] = v match {
      case m: java.util.Map[_, _] =>
        Option(m.asInstanceOf[java.util.Map[String, Object]].get(key))
      case _ => None
    }
    def int(key: String, dflt: Int): Int = get(key).map {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"config key '$key' must be an integer, got: $other")
    }.getOrElse(dflt)
    def long(key: String, dflt: Long): Long = get(key).map {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"config key '$key' must be an integer, got: $other")
    }.getOrElse(dflt)
    def dbl(key: String, dflt: Double): Double = get(key).map {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"config key '$key' must be a number, got: $other")
    }.getOrElse(dflt)
    def bool(key: String, dflt: Boolean): Boolean = get(key).map {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"config key '$key' must be a boolean, got: $other")
    }.getOrElse(dflt)
    def str(key: String, dflt: String): String = get(key).map {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"config key '$key' must be a string, got: $other")
    }.getOrElse(dflt)
  }
}

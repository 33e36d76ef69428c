package graft

import org.apache.spark.sql.functions._

import graft.index.{AdaptiveNprobe, Ivf, ServingIndex}
import graft.ingest.IngestGuard
import graft.streaming.Wal

/** GraftConfig — the reference's loadConfig/validateConfig/applyDefaults
  * surface (config.cpp:14-74 over configs/woved-default.yaml).
  */
class GraftConfigSpec extends SparkSpec {
  import spark.implicits._

  /** The reference's own default config when the reference checkout is
    * present; the repo's knob-identical copy otherwise (CI without the
    * reference tree).
    */
  private def defaultYamlPath: String = {
    val ref = "/root/reference/configs/woved-default.yaml"
    if (new java.io.File(ref).exists()) ref
    else "configs/graft-default.yaml"
  }

  test("reference default yaml loads and carries the reference knobs (config.cpp loadConfig)") {
    val c = GraftConfig.load(defaultYamlPath)
    assert(c.collection.dim === 768)
    assert(c.collection.metric === "ip")
    assert(c.collection.maxVectors === 100000000L)
    assert(c.wal.rotateBytes === 3221225472L)
    assert(c.wal.maxFiles === 10)
    assert(c.wal.compression === "none")
    assert(c.segment.targetSizeVectors === 2000000L)
    assert(c.segment.maxSegmentsPerLeaf === 8)
    assert(c.delta.nlist === 1024 && c.delta.nprobe === 6)
    assert(c.stable.nlist === 4096 && c.stable.nprobe === 12)
    assert(c.stable.pqM === 96 && c.stable.pqNbits === 8 && c.stable.useOpq)
    assert(c.stable.rerankFactor === 4)
    assert(c.global.memoryCacheMb === 512)
    assert(!c.hnswCache.enabled && c.hnswCache.maxElements === 1000000)
    assert(c.filtering.bloomFilterFpp === 0.01)
    assert(c.filtering.denseBitmapThreshold === 0.2)
    assert(c.filtering.maxTagsPerVector === 16)
    assert(c.query.maxCandidates === 10000 && c.query.maxTopK === 100)
    assert(c.tuning.recallTarget === 0.95)
    assert(c.tuning.nprobeDeltaMin === 4 && c.tuning.nprobeDeltaMax === 8)
    assert(c.tuning.nprobeStableMin === 8 && c.tuning.nprobeStableMax === 16)
    assert(c.limits.maxUpsertBatch === 10000)
    assert(c.limits.maxQueryBatch === 100)
    assert(c.limits.maxRequestBytes === 104857600L)
    assert(c.recovery.maxRecoveryTimeS === 30)
    // loading the file equals the programmatic defaults — the defaults
    // ARE the reference's defaults (applyDefaults)
    assert(c.copy(workerThreads = 0) === GraftConfig.default)
  }

  test("partial yaml overlays onto defaults; unknown sections are ignored") {
    val c = GraftConfig.loadYaml(
      """
        |collection:
        |  dim: 64
        |storage:
        |  wal:
        |    compression: zstd
        |    max_files: 4
        |index:
        |  stable:
        |    pq:
        |      m: 8
        |server:
        |  grpc_port: 9090
        |  worker_threads: 7
        |io:
        |  use_iouring: true
        |""".stripMargin)
    assert(c.collection.dim === 64)
    assert(c.wal.compression === "zstd" && c.wal.maxFiles === 4)
    assert(c.stable.pqM === 8)
    assert(c.workerThreads === 7)
    // untouched keys keep reference defaults
    assert(c.delta.nlist === 1024)
    assert(c.query.timeoutMs === 5000L)
    assert(c.walCodec === graft.streaming.WalCodec.Zstd)
  }

  test("an empty yaml (the reference's 0-byte dev/prod/bench stubs) loads as pure defaults") {
    assert(GraftConfig.loadYaml("") === GraftConfig.default)
    // and the reference's own stub files, when present, load the same way
    val stubs = Seq("woved-dev.yaml", "woved-prod.yaml", "woved-bench.yaml")
      .map(f => new java.io.File(s"/root/reference/configs/$f"))
      .filter(_.exists())
    stubs.foreach { f =>
      assert(GraftConfig.load(f.getPath) === GraftConfig.default, f.getName)
    }
  }

  test("validate rejects inconsistent configs with the offending key") {
    def bad(yaml: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](GraftConfig.loadYaml(yaml))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("collection:\n  dim: 0\n", "collection.dim")
    bad("collection:\n  dim: 100\n", "pq.m") // 96 does not divide 100
    bad("index:\n  delta:\n    nprobe: 5000\n", "delta.nprobe")
    bad("storage:\n  wal:\n    compression: gzip\n", "unknown WAL codec")
    bad("tuning:\n  recall_target: 1.5\n", "recall_target")
    bad("query:\n  max_candidates: 5\n", "max_candidates")
    // type errors name the key instead of coercing
    bad("storage:\n  wal:\n    max_files: many\n", "max_files")
  }

  test("worker_threads 0 auto-detects (applyDefaults, config.cpp:70-74)") {
    assert(GraftConfig.default.resolvedWorkerThreads ===
      Runtime.getRuntime.availableProcessors())
    assert(GraftConfig.default.copy(workerThreads = 3)
      .resolvedWorkerThreads === 3)
  }

  test("a serving + ingest stack stands up from the file alone") {
    // dim-4 fixture config: everything below comes FROM the config
    val c = GraftConfig.loadYaml(
      """
        |collection:
        |  dim: 4
        |  metric: ip
        |index:
        |  delta:
        |    nlist: 4
        |    nprobe: 2
        |  stable:
        |    pq:
        |      m: 2
        |storage:
        |  wal:
        |    compression: lz4
        |    rotate_bytes: 256
        |    max_files: 3
        |limits:
        |  max_upsert_batch: 50
        |""".stripMargin)

    // ingest guard from config: a 50-row batch admits, a 51-row rejects
    val mk = (n: Int) => (0 until n).map(i =>
        (s"id-$i", Seq.fill(c.collection.dim)(i.toDouble)))
      .toDF("id", "vec")
    IngestGuard.validateBatch(mk(50), c.ingestLimits, idCol = Some("id"))
    intercept[graft.ingest.UpsertBatchTooLarge] {
      IngestGuard.validateBatch(mk(51), c.ingestLimits, idCol = Some("id"))
    }
    // dim enforcement comes from collection.dim
    val badDim = Seq(("x", Seq(1.0, 2.0))).toDF("id", "vec")
    intercept[graft.ingest.DimMismatch] {
      IngestGuard.validateBatch(badDim, c.ingestLimits, idCol = Some("id"))
    }

    // serving index from config: delta-tier nlist/nprobe + query limits
    val rows = (0 until 200).map { i =>
      val v = Array.tabulate(c.collection.dim)(d =>
        math.cos(i * 0.37 + d).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    // one centroid per every-(200/nlist)th row → exactly nlist lists
    val cents = Ivf.deterministicCentroids(rows, 200 / c.delta.nlist)
    val idx = ServingIndex.build(Ivf.assign(rows, cents), cents,
      c.collection.metric, limits = c.servingLimits)
    try {
      val q = Array.tabulate(c.collection.dim)(d => math.cos(0.37 + d).toFloat)
      val got = idx.search(q, c.query.defaultTopK, c.delta.nprobe)
      assert(got.length === c.query.defaultTopK)
      // maxTopK clamp comes from query.max_top_k
      assert(idx.search(q, c.query.maxTopK + 50, c.delta.nprobe)
        .length <= c.query.maxTopK)
    } finally idx.unpersist()

    // adaptive-nprobe controller from the tuning bands
    val ctl = new AdaptiveNprobe(c.tuning.nprobeDeltaMin,
      c.tuning.nprobeDeltaMax, target = c.tuning.recallTarget)
    assert(ctl.current === c.tuning.nprobeDeltaMin)

    // WAL from config: codec + rotate + max_files backstop
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-wal-")
      .toString
    val recs = (1L to 40L).map(e =>
      (e, s"""{"e":$e,"pad":"${"y" * 64}"}""".getBytes("UTF-8")))
    intercept[Wal.WalAtCapacity] {
      recs.grouped(10).foreach(g => Wal.appendBinaryRotating(dir, g.toSeq,
        rotateBytes = c.wal.rotateBytes, codec = c.walCodec,
        maxFiles = c.wal.maxFiles))
    }
    assert(Wal.segments(dir).length === c.wal.maxFiles)
    val replayed = Wal.replayBinaryRotated(dir)
    assert(replayed.map(_._1) === (1L to (10L * c.wal.maxFiles)))
  }
}

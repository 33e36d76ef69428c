package graft.index

import java.util.concurrent.atomic.AtomicLong

/** Cache-hierarchy ROUTER for the stable PQ tier — the wiring between
  * the reference's memory-cache split (configs/woved-default.yaml:85-89
  * `memory_cache_mb`) and its stable IVF-PQ store (config.h:84-94):
  *
  *   L0  [[LocalPqIndex]]     driver-resident packed codes — zero
  *                            scheduler dispatch, sub-ms at reference
  *                            list sizes; byte-budgeted, so it may not
  *                            cover every list.
  *   L1  [[PqServingIndex]]   distributed block-manager codes tier —
  *                            nprobe in-memory tasks per request
  *                            (measured steady p99 68.7 ms at the 100M
  *                            geometry); covers the whole corpus when
  *                            warm.
  *   L2  `stored`             the declarative stored path (partition-
  *                            pruned parquet ADC) — the true COLD
  *                            layer (measured p99 ~1076 ms at 100M on
  *                            local[32]; an executor count divides it
  *                            on a real cluster).
  *
  * A request serves from the SHALLOWEST level that covers every probed
  * list ([[LocalPqIndex.coversRequest]] / [[PqServingIndex
  * .coversRequest]] — the same probe ranking + max_candidates walk the
  * scans themselves run, so routing never turns into a coverage
  * refusal mid-serve). All three levels share the ADC contract
  * ([[Pq.lutForMetric]] LUT, sequential double accumulation,
  * (score desc, id asc) ranking), so WHICH level serves is invisible
  * in the values — PqTieredServingSpec pins route-choice parity — and
  * only visible in latency and in the per-level counters below
  * (bench observability: `ivf_100m_route_*`).
  *
  * The levels must be built over the SAME corpus snapshot, codebook,
  * and serving limits — the router routes, it does not reconcile
  * generations (that is the admission passes' job, like every cache
  * pair in the engine).
  *
  * Thread-safe: routing reads immutable tier state; counters are
  * atomics.
  */
final class PqTieredServing(
    local: Option[LocalPqIndex],
    dist: Option[PqServingIndex],
    stored: (Array[Float], Int, Int, String) => Array[(Long, Double)]) {

  private val localN = new AtomicLong(0L)
  private val distN = new AtomicLong(0L)
  private val storedN = new AtomicLong(0L)

  /** Requests served by the driver tier. */
  def localServes: Long = localN.get()
  /** Requests that fell through to the distributed tier. */
  def distServes: Long = distN.get()
  /** Requests that fell through past both cache levels to the store. */
  def storedServes: Long = storedN.get()

  /** Phase-1 ADC top-k through the hierarchy (client-facing — each
    * tier applies its own maxK clamp; the `stored` closure receives
    * the caller's k unchanged and must clamp itself if it cares).
    */
  def searchAdc(q: Array[Float], k: Int, nprobe: Int,
      metric: String = "ip"): Array[(Long, Double)] = {
    val kk = Seq(local.map(_.limits.maxK), dist.map(_.limits.maxK))
      .flatten.foldLeft(k)(math.min)
    searchAdcUnclamped(q, kk, nprobe, metric)
  }

  /** Phase-1 ranking at a two-phase caller's INTERNAL rerank·k budget
    * — unclamped on both cache levels; the `stored` closure receives
    * `n` as its k and must treat it as an internal budget too. The
    * centroid ranking + max_candidates walk runs ONCE here and the
    * probe set is passed through to the serving tier (the tiers share
    * one layout by the router's construction contract), so routing
    * costs one probe, not two or three.
    */
  private[graft] def searchAdcUnclamped(q: Array[Float], n: Int,
      nprobe: Int, metric: String = "ip"): Array[(Long, Double)] = {
    val probed = local.map(_.probeFor(q, nprobe, metric))
      .orElse(dist.map(_.probeFor(q, nprobe, metric)))
    probed match {
      case Some(p) if local.exists(_.coversProbes(p)) =>
        localN.incrementAndGet()
        local.get.searchAdcOnProbed(p, q, n, metric)
      case Some(p) if dist.exists(_.coversProbes(p)) =>
        distN.incrementAndGet()
        dist.get.searchAdcOnProbed(p, q, n, metric)
      case _ =>
        storedN.incrementAndGet()
        stored(q, n, nprobe, metric)
    }
  }
}

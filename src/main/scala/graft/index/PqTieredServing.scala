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
      metric: String = "ip"): Array[(Long, Double)] =
    route(q, nprobe,
      t => t.searchAdc(q, k, nprobe, metric),
      t => t.searchAdc(q, k, nprobe, metric),
      () => stored(q, k, nprobe, metric))

  /** Phase-1 ranking at a two-phase caller's INTERNAL rerank·k budget
    * — unclamped on both cache levels (their `searchAdcUnclamped`
    * twins); the `stored` closure receives `n` as its k and must
    * treat it as an internal budget too.
    */
  private[graft] def searchAdcUnclamped(q: Array[Float], n: Int,
      nprobe: Int, metric: String = "ip"): Array[(Long, Double)] =
    route(q, nprobe,
      t => t.searchAdcUnclamped(q, n, nprobe, metric),
      t => t.searchAdcUnclamped(q, n, nprobe, metric),
      () => stored(q, n, nprobe, metric))

  private def route(q: Array[Float], nprobe: Int,
      viaLocal: LocalPqIndex => Array[(Long, Double)],
      viaDist: PqServingIndex => Array[(Long, Double)],
      viaStored: () => Array[(Long, Double)]): Array[(Long, Double)] =
    local.filter(_.coversRequest(q, nprobe)) match {
      case Some(t) =>
        localN.incrementAndGet()
        viaLocal(t)
      case None =>
        dist.filter(_.coversRequest(q, nprobe)) match {
          case Some(t) =>
            distN.incrementAndGet()
            viaDist(t)
          case None =>
            storedN.incrementAndGet()
            viaStored()
        }
    }
}

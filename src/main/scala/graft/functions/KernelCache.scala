package graft.functions

/** Small bounded LRU for per-JVM kernel state (automatons, parsed rule
  * tables, vocab tries). Executors are long-running: an UNbounded
  * ConcurrentHashMap keyed by expression payload accumulates one
  * blocklist-sized structure per distinct payload for the JVM's
  * lifetime. This cache holds the hot few (access-order LRU) and lets
  * evicted entries be rebuilt on demand — a duplicate concurrent build
  * is benign (both results are valid; one wins).
  */
private[functions] final class KernelCache[K, V](maxEntries: Int) {
  require(maxEntries > 0)
  private val m = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > maxEntries
    })

  def getOrCompute(k: K, f: java.util.function.Function[K, V]): V = {
    // build OUTSIDE the map lock: computeIfAbsent under the synchronized
    // wrapper would hold the single monitor for the whole build,
    // serializing every other thread's cache HIT (even on other keys)
    // behind a blocklist-sized DFA construction. The cost is a possible
    // duplicate concurrent build of the same key — benign, both results
    // are valid and putIfAbsent keeps the first.
    val hit = m.get(k)
    if (hit != null) return hit
    val built = f(k)
    val raced = m.putIfAbsent(k, built)
    if (raced != null) raced else built
  }

  private[functions] def sizeNow: Int = m.size()
}
